"""GeoJSON/NDJSON readers: geometry normalization, props, PIP integration."""

import json

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.sources.geojson import (
    read_geojson_polygons,
    read_ndgeojson_points,
    read_ndgeojson_polygons,
)


def _feature(gtype, coords, fid=None, props=None):
    f = {"type": "Feature", "geometry": {"type": gtype, "coordinates": coords},
         "properties": props or {}}
    if fid is not None:
        f["id"] = fid
    return f


SQUARE = [[[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]]
HOLED = SQUARE + [[[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0], [2.0, 2.0]]]


@pytest.fixture()
def nd_path(tmp_path):
    p = tmp_path / "feats.ndjson"
    lines = [
        _feature("Polygon", SQUARE, fid="sq", props={"zone": "a"}),
        _feature("Polygon", HOLED, fid="holed"),
        _feature("MultiPolygon", [SQUARE, [[[20.0, 20.0], [25.0, 20.0], [25.0, 25.0], [20.0, 25.0], [20.0, 20.0]]]], fid="mp"),
        _feature("Point", [3.0, 3.0], fid="p1", props={"k": "v"}),
        _feature("LineString", [[0.0, 0.0], [1.0, 1.0]], fid="ignored"),
    ]
    p.write_text("\n".join(json.dumps(l) for l in lines) + "\n")
    return str(p)


def test_ndgeojson_polygons(spark, nd_path):
    df = read_ndgeojson_polygons(spark, nd_path)
    rows = {r.feature_id: r for r in df.collect()}
    assert set(rows) == {"sq", "holed", "mp#0", "mp#1"}
    assert rows["sq"].props["zone"] == "a"
    assert len(rows["holed"].rings) == 2  # outer + hole
    assert rows["mp#1"].rings[0][0] == [20.0, 20.0]


def test_ndgeojson_points(spark, nd_path):
    df = read_ndgeojson_points(spark, nd_path)
    rows = {r.feature_id: r for r in df.collect()}
    assert set(rows) == {"p1"}
    assert (rows["p1"].lon, rows["p1"].lat) == (3.0, 3.0) and rows["p1"].props["k"] == "v"


def test_collection_file(spark, tmp_path):
    fc = {"type": "FeatureCollection", "features": [
        _feature("Polygon", SQUARE, fid="sq1"),
        _feature("Polygon", SQUARE, fid="sq2"),
    ]}
    p = tmp_path / "fc.geojson"
    p.write_text(json.dumps(fc))
    df = read_geojson_polygons(spark, str(p))
    assert sorted(r.feature_id for r in df.collect()) == ["sq1", "sq2"]


def test_geojson_feeds_pip_join(spark, nd_path):
    """End-to-end: GeoJSON polygon layer -> cell-partitioned PIP join."""
    from versatiles_rs_spark.joins.pip import pip_join_polygons_partitioned

    polys = read_ndgeojson_polygons(spark, nd_path).withColumnRenamed("feature_id", "poly_id")
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 3.0, 3.0), (3, 50.0, 50.0), (4, 22.0, 22.0)],
        "event_id long, lon double, lat double",
    )
    out = pip_join_polygons_partitioned(pts, polys.select("poly_id", "rings"), cell_zoom=4)
    got = sorted((r.event_id, r.poly_id) for r in out.collect())
    # (2) at (3,3) is inside the hole of `holed` -> excluded from it
    assert got == [(1, "holed"), (1, "mp#0"), (1, "sq"), (2, "mp#0"), (2, "sq"), (4, "mp#1")]
