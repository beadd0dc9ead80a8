"""Tile container sources.

Parity (/root/reference/versatiles_container/src/container/):
- directory/reader.rs (472 LoC): `{z}/{x}/{y}.{ext}[.gz]` file-tree scan;
- tar/reader.rs: same layout inside a tar (edge ingest; here the tree form);
- versatiles/mbtiles/pmtiles readers: block/SQLite/Hilbert container scans —
  their *analytical* role (a keyed, pruned tile relation) is played by
  parquet tile tables; the readers here are the ingestion edge.

Spark strategy: `spark.read.format("binaryFile")` + path-regex extraction of
(z, x, y, ext) — distributed, no driver listing; compressed payloads
(.png.gz) are decompressed JVM-side-adjacent in an Arrow-batched kernel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PATH_RE = r"^.*/(\d+)/(\d+)/(\d+)\.([a-z0-9.]+)$"


def read_directory_tree(spark: SparkSession, root: str) -> DataFrame:
    """Scan a {z}/{x}/{y}.{ext} tile tree into (z,x,y,fmt,codec,bytes).

    binaryFile scan -> regexp path parse (JVM) -> gzip decode only for rows
    that need it (directory/reader.rs:ext handling; tile_compression
    sniffing). Unparseable paths are dropped (the reference skips non-tile
    files the same way).
    """
    raw = spark.read.format("binaryFile").option("recursiveFileLookup", "true").load(root)
    parsed = raw.select(
        F.regexp_extract("path", PATH_RE, 1).alias("zs"),
        F.regexp_extract("path", PATH_RE, 2).alias("xs"),
        F.regexp_extract("path", PATH_RE, 3).alias("ys"),
        F.regexp_extract("path", PATH_RE, 4).alias("ext"),
        F.col("content").alias("bytes"),
    ).filter(F.col("zs") != "")
    df = parsed.select(
        F.col("zs").cast("int").alias("z"),
        F.col("xs").cast("long").alias("x"),
        F.col("ys").cast("long").alias("y"),
        F.when(F.col("ext").endswith(".gz"), F.lit("gzip")).otherwise(F.lit("none")).alias("codec"),
        F.regexp_replace("ext", r"\.gz$", "").alias("fmt"),
        "bytes",
    )

    # decompress gzip payloads so downstream kernels see raw tile bytes
    def gunzip(batches):
        import gzip

        for pdf in batches:
            if (pdf["codec"] == "gzip").any():
                pdf = pdf.copy()
                mask = pdf["codec"] == "gzip"
                pdf.loc[mask, "bytes"] = pdf.loc[mask, "bytes"].map(
                    lambda b: gzip.decompress(bytes(b))
                )
                pdf["codec"] = "none"
            yield pdf

    return df.mapInPandas(gunzip, schema=df.schema)


def read_tile_table(spark: SparkSession, path: str, bbox=None, zoom_range=None) -> DataFrame:
    """Canonical tile-table scan with pushdown-friendly pruning predicates
    (from_container analog: filters reach parquet as PushedFilters /
    partition pruning — converter.rs:153-155 semantics)."""
    df = spark.read.parquet(path)
    if zoom_range is not None:
        lo, hi = zoom_range
        df = df.filter((F.col("z") >= lo) & (F.col("z") <= hi))
    if bbox is not None:
        x0, y0, x1, y1 = bbox
        df = df.filter(
            (F.col("x") >= x0) & (F.col("x") <= x1) & (F.col("y") >= y0) & (F.col("y") <= y1)
        )
    return df


def get_tile(df: DataFrame, z: int, x: int, y: int):
    """Point lookup — the `serve` analog (/root/reference/versatiles/src/server/
    routes.rs:14-22 -> reader.get_tile). On a z/block-partitioned or
    Hilbert-sorted table the (z,x,y) predicate prunes to one file/row-group;
    returns the Row or None."""
    hits = df.filter((F.col("z") == z) & (F.col("x") == x) & (F.col("y") == y)).limit(1).collect()
    return hits[0] if hits else None


def tilejson_for(df: DataFrame) -> dict:
    """TileJSON-3.0-style metadata for a tile relation (tilejson/lib.rs:51):
    zoom bounds + geographic bounds derived from the per-zoom tile bboxes."""
    from .. import tile_math as tm

    agg = (
        df.groupBy("z")
        .agg(
            F.min("x").alias("x0"), F.min("y").alias("y0"),
            F.max("x").alias("x1"), F.max("y").alias("y1"),
            F.count("*").alias("n"),
        )
        .orderBy("z")
        .collect()
    )
    if not agg:
        return {"tilejson": "3.0.0", "minzoom": None, "maxzoom": None, "bounds": None}
    zmax_row = agg[-1]
    west, _, _, north = tm.tile_to_geo_bbox(zmax_row.z, zmax_row.x0, zmax_row.y0)
    _, south, east, _ = tm.tile_to_geo_bbox(zmax_row.z, zmax_row.x1, zmax_row.y1)
    return {
        "tilejson": "3.0.0",
        "minzoom": int(agg[0].z),
        "maxzoom": int(zmax_row.z),
        "bounds": [float(west), float(south), float(east), float(north)],
        "levels": {int(r.z): {"bbox": [int(r.x0), int(r.y0), int(r.x1), int(r.y1)], "n_tiles": int(r.n)} for r in agg},
    }
