"""Incremental tileset diff (operators/diff.py): planted change classes,
empty-diff on identical inputs, and the plan gate — the payload column
must be fingerprinted map-side and never appear in a shuffle."""

import pandas as pd
from pyspark.sql import functions as F

from versatiles_rs_spark.operators.diff import tile_diff


def _tiles(spark, rows):
    pdf = pd.DataFrame(rows, columns=["z", "x", "y", "payload"])
    return spark.createDataFrame(pdf, schema="z int, x long, y long, payload string")


def test_tile_diff_change_classes(spark):
    old = _tiles(spark, [(8, 1, 1, "a"), (8, 1, 2, "b"), (8, 1, 3, "c")])
    new = _tiles(spark, [(8, 1, 1, "a"), (8, 1, 2, "B"), (8, 1, 4, "d")])
    got = {(r.z, r.x, r.y): r.change for r in tile_diff(old, new).collect()}
    assert got == {
        (8, 1, 2): "changed",
        (8, 1, 3): "removed",
        (8, 1, 4): "added",
    }  # (8,1,1) unchanged -> absent


def test_tile_diff_identical_is_empty(spark):
    t = _tiles(spark, [(8, i, i, f"p{i}") for i in range(20)])
    assert tile_diff(t, t).count() == 0


def test_tile_diff_binary_payload_and_md5(spark):
    old = _tiles(spark, [(8, 1, 1, "x")]).withColumn(
        "payload", F.col("payload").cast("binary")
    )
    new = _tiles(spark, [(8, 1, 1, "y")]).withColumn(
        "payload", F.col("payload").cast("binary")
    )
    rows = tile_diff(old, new, fingerprint=F.md5).collect()
    assert [(r.z, r.x, r.y, r.change) for r in rows] == [(8, 1, 1, "changed")]


def test_tile_diff_plan_payload_never_shuffles(spark, sf_dir):
    """100 TB gate: the full-outer join must move only (z,x,y,hash) — the
    payload is digested before the Exchange on both sides."""
    from versatiles_rs_spark.queries import REGISTRY

    df = REGISTRY["tile_diff"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "payload" not in line, line
    assert "Python" not in plan  # md5/xxhash64 are JVM expressions
