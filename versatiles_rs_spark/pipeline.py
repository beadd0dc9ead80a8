"""Flagship end-to-end pipeline: the north-rule headline job.

BASELINE.json metric: "tiles encoded + PIP-joined rows/sec on 10^12-image
Iceberg table (SF-scaled sample), with throughput scaling efficiency >=0.8
from N to 4N executors".

Stages (all DataFrame-native, Arrow-batched Python only for pixel work):

1. generate/read `images` (input_hint shape) — at scale this is an Iceberg
   scan; here the deterministic distributed generator (fixtures.images_df).
2. derive lon/lat from phash bit-slices (vectorized), assign (z,x,y) at a
   fixed zoom via JVM column expressions (tile_coord.rs:64-80 semantics).
3. encode tiles: re-encode each image payload into the target tile format
   with per-zoom quality (raster_format.rs:115-165 semantics) and attach the
   Hilbert tile_id (PMTiles order, tile_hilbert_index.rs:81-113).
4. PIP-join the records against a polygon layer (cell-partitioned equi-join
   + exact ray-cast; broadcast path for small layers).
5. aggregate per (zone, z, x, y) — the materialized result.

Scale notes (SURVEY.md §4): one shuffle (the cell equi-join); tile/cell keys
are plain columns so partition pruning works; hot-cell skew handled by AQE
skew-join (session.py) + optional salting; Arrow batch size bounded.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fixtures
from .joins.pip import pip_join_polygons_partitioned
from .operators.raster import parse_quality_table


def flagship(
    spark: SparkSession,
    n_images: int = 20000,
    zoom: int = 12,
    n_polygons: int = 200,
    img_size: int = 64,
    partitions: int | None = None,
    target_fmt: str = "jpg",
    quality: str | int = "0-9:90,10-14:80",
) -> DataFrame:
    """Build (lazily) the flagship DataFrame; caller triggers execution.

    Physical plan shape (the one we want at 100 TB):
    - ONE fused Python stage does all payload work (generate/decode/encode +
      coordinate derivation + Hilbert id) — and because this job only ever
      aggregates payload SIZE, the stage emits `nbytes` instead of the blobs
      (fixtures.images_with_tiles_df emit_bytes=False): the encode runs per
      row but the ~KB payloads never cross the Arrow boundary back to the
      JVM. That is the column pruning Catalyst cannot see through a UDF,
      done by hand.
    - tiles re-encode as JPEG (real libjpeg), so the per-zoom quality table
      (raster_format.rs semantics) actually applies — PNG ignored it.
    - the PIP shuffle moves ~50-byte rows, not ~10 KB rows (200x less
      shuffle IO).
    - the PIP join itself is a cell-keyed equi-join (shuffle hash, AQE skew
      handling) followed by an Arrow-batched exact ray-cast.
    """
    # 4 waves of ~n/(4*cores)-row tasks: measured sweet spot (64→128 parts at
    # 640k/32 cores cut wall time 28% — better balance, same per-task Arrow
    # batching); at 100 TB the equivalent knob is maxPartitionBytes
    parts = partitions or spark.sparkContext.defaultParallelism * 4
    qt = parse_quality_table(quality)
    encoded = fixtures.images_with_tiles_df(
        spark,
        n_images,
        size=img_size,
        zoom=zoom,
        partitions=parts,
        skew=True,
        target_fmt=target_fmt,
        quality_table=qt,
        emit_bytes=False,
    )
    slim = encoded.select(
        "image_id", "lon", "lat", "z", "x", "y", "hilbert", "nbytes",
    )
    polys = fixtures.polygons_df(spark, n_polygons)
    joined = pip_join_polygons_partitioned(slim, polys, cell_zoom=6)
    return joined.groupBy("poly_id", "z", "x", "y").agg(
        F.count("*").alias("n_images"),
        F.sum("nbytes").alias("tile_bytes"),
        F.min("hilbert").alias("min_tile_id"),
    )


def flagship_scan(
    spark: SparkSession,
    images_path: str,
    zoom: int = 12,
    n_polygons: int = 200,
    target_fmt: str = "jpg",
    quality: str | int = "0-9:90,10-14:80",
    scan_mode: str = "python",
) -> DataFrame:
    """Deployment-shaped flagship: READ the stored images table (the north
    rule's "10^12-image Iceberg table (SF-scaled sample)"), then the same
    pipeline — fused decode+tile-encode+coords, slim PIP join, aggregate.

    vs `flagship` (which synthesizes its input inline): the stored-format
    ENCODE is ingest cost paid once at materialization, not per query — no
    production tiling job re-encodes its input corpus per run. Output is
    identical (pytest-asserted parity).

    scan_mode:
    - "python" (default): fused pyarrow scan — file splits go through the
      JVM, the Python task reads its part-file directly and runs the tile
      kernel in place, so blobs move storage -> Python ONCE and only slim
      columns ever reach the JVM (sources/arrow_scan.py). Measured 12.3 ->
      ~6 s at 100k/local[32] vs the JVM scan, which parquet-decodes every
      blob in the JVM and re-serializes it over Arrow.
    - "jvm": spark.read.parquet -> mapInPandas; the Catalyst-native shape,
      kept for plan comparison and as the path predicate pushdown favors."""
    qt = parse_quality_table(quality)
    if scan_mode == "python":
        from .sources.arrow_scan import read_parquet_pythonside

        kernel = fixtures.make_tile_kernel(
            zoom=zoom, skew=True, target_fmt=target_fmt,
            quality_table=qt, emit_bytes=False,
        )
        encoded = read_parquet_pythonside(
            spark, images_path,
            schema=fixtures.tile_kernel_schema(emit_bytes=False),
            kernel=kernel,
        )
    else:
        images = spark.read.parquet(images_path)
        encoded = fixtures.tiles_from_images_df(
            images, zoom=zoom, skew=True, target_fmt=target_fmt,
            quality_table=qt, emit_bytes=False,
        )
    slim = encoded.select(
        "image_id", "lon", "lat", "z", "x", "y", "hilbert", "nbytes",
    )
    polys = fixtures.polygons_df(spark, n_polygons)
    joined = pip_join_polygons_partitioned(slim, polys, cell_zoom=6)
    return joined.groupBy("poly_id", "z", "x", "y").agg(
        F.count("*").alias("n_images"),
        F.sum("nbytes").alias("tile_bytes"),
        F.min("hilbert").alias("min_tile_id"),
    )


def run_flagship_scan(spark: SparkSession, n_images: int = 20000, **kw) -> dict:
    """Materialize the images table if needed (untimed — ingest), then
    execute the scan-based flagship and return throughput metrics.

    Scan parallelism: Spark bin-packs small parquet files up to
    maxPartitionBytes (default 128 MB), which would collapse an SF-scaled
    sample into a handful of input partitions and starve the fused Python
    stage.  Repartitioning is NOT the fix — it would shuffle the payload
    blobs (banned, test_plan_quality).  Instead size maxPartitionBytes so
    the scan itself yields ~4 tasks/core — the exact knob a 100 TB job
    tunes, where the same math gives the same wave shape."""
    import os

    path = fixtures.materialize_images(spark, n_images)
    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    want_parts = spark.sparkContext.defaultParallelism * 4
    part_bytes = max(1 << 20, total // want_parts)
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(part_bytes))
    try:
        t0 = time.time()
        out = flagship_scan(spark, path, **kw)
        joined_rows = out.agg(F.sum("n_images")).collect()[0][0] or 0
        elapsed = time.time() - t0
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    processed = n_images + int(joined_rows)
    return {
        "n_images": n_images,
        "pip_rows": int(joined_rows),
        "sec": round(elapsed, 2),
        "rows_per_sec": round(processed / elapsed, 1),
    }


def run_flagship(spark: SparkSession, n_images: int = 20000, **kw) -> dict:
    """Execute the flagship job and return throughput metrics."""
    t0 = time.time()
    out = flagship(spark, n_images=n_images, **kw)
    joined_rows = out.agg(F.sum("n_images")).collect()[0][0] or 0
    elapsed = time.time() - t0
    processed = n_images + int(joined_rows)  # tiles encoded + PIP-joined rows
    return {
        "n_images": n_images,
        "pip_rows": int(joined_rows),
        "sec": round(elapsed, 2),
        "rows_per_sec": round(processed / elapsed, 1),
    }
