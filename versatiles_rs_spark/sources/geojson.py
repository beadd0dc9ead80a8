"""GeoJSON / NDJSON feature readers.

Parity: /root/reference/versatiles_geometry/src/geojson/read.rs:21-56
(`read_geojson`, `read_ndgeojson_iter/stream`) and the custom parser under
versatiles_core/src/json/. Geometry model mirrors geo/geometry.rs:25
(Point/LineString/Polygon + Multi*).

Spark strategy: NDJSON is the scale path — one feature per line, parsed
distributed via spark.read.text + an Arrow-batched json kernel (the stdlib
parser is fine here: parsing is once-per-ingest, not in the query hot path).
Whole-file FeatureCollections are split into features first (driver-side
file listing, feature explode inside tasks via wholeTextFiles analog).

Output schemas (directly joinable by the engine):
- polygons: (feature_id string, rings array<array<array<double>>>,
             props map<string,string>)  -> joins/pip.py
- points:   (feature_id string, lon double, lat double, props map)
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

POLY_SCHEMA = "feature_id string, rings array<array<array<double>>>, props map<string,string>"
POINT_SCHEMA = "feature_id string, lon double, lat double, props map<string,string>"


def _norm_props(props) -> dict:
    return {str(k): str(v) for k, v in (props or {}).items()}


def _poly_rows(feat: dict, default_id: str):
    """Yield (id, rings, props) rows for Polygon/MultiPolygon features."""
    geom = feat.get("geometry") or {}
    gtype = geom.get("type")
    fid = str(feat.get("id", feat.get("properties", {}).get("id", default_id)))
    props = _norm_props(feat.get("properties"))
    if gtype == "Polygon":
        polys = [geom["coordinates"]]
    elif gtype == "MultiPolygon":
        polys = geom["coordinates"]
    else:
        return
    for i, rings in enumerate(polys):
        rid = fid if len(polys) == 1 else f"{fid}#{i}"
        clean = [[[float(p[0]), float(p[1])] for p in ring] for ring in rings]
        yield (rid, clean, props)


def _point_rows(feat: dict, default_id: str):
    geom = feat.get("geometry") or {}
    gtype = geom.get("type")
    fid = str(feat.get("id", feat.get("properties", {}).get("id", default_id)))
    props = _norm_props(feat.get("properties"))
    if gtype == "Point":
        c = geom["coordinates"]
        yield (fid, float(c[0]), float(c[1]), props)
    elif gtype == "MultiPoint":
        for i, c in enumerate(geom["coordinates"]):
            yield (f"{fid}#{i}", float(c[0]), float(c[1]), props)


def read_ndgeojson_polygons(spark: SparkSession, path: str) -> DataFrame:
    """NDJSON (one Feature per line) -> polygon relation, fully distributed.

    Fallback ids for id-less features use monotonically_increasing_id (globally
    unique: partition id << 33 | row offset) — batch-local offsets would
    collide across partitions and corrupt feature_id-keyed joins.
    """
    from pyspark.sql import functions as F

    lines = spark.read.text(path).withColumn("_gid", F.monotonically_increasing_id())

    def parse(batches):
        for pdf in batches:
            rows = []
            for gid, line in zip(pdf["_gid"], pdf["value"]):
                line = line.strip()
                if not line:
                    continue
                rows.extend(_poly_rows(json.loads(line), f"f{gid}"))
            yield pd.DataFrame(rows, columns=["feature_id", "rings", "props"])

    return lines.mapInPandas(parse, schema=POLY_SCHEMA)


def read_ndgeojson_points(spark: SparkSession, path: str) -> DataFrame:
    from pyspark.sql import functions as F

    lines = spark.read.text(path).withColumn("_gid", F.monotonically_increasing_id())

    def parse(batches):
        for pdf in batches:
            rows = []
            for gid, line in zip(pdf["_gid"], pdf["value"]):
                line = line.strip()
                if not line:
                    continue
                rows.extend(_point_rows(json.loads(line), f"f{gid}"))
            yield pd.DataFrame(rows, columns=["feature_id", "lon", "lat", "props"])

    return lines.mapInPandas(parse, schema=POINT_SCHEMA)


def read_geojson_polygons(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file FeatureCollection(s): binaryFile scan (one task per file),
    features exploded inside the task — fine for collection-per-file layouts;
    use NDJSON for single giant collections."""
    raw = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                doc = json.loads(bytes(blob).decode("utf-8"))
                feats = doc.get("features", [doc] if doc.get("type") == "Feature" else [])
                for i, f in enumerate(feats):
                    rows.extend(_poly_rows(f, f"f{i}"))
            yield pd.DataFrame(rows, columns=["feature_id", "rings", "props"])

    return raw.mapInPandas(parse, schema=POLY_SCHEMA)
