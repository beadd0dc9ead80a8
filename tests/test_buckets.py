"""Aspect-ratio bucketing (functions/buckets.py): brute-force parity,
batch-assembly invariants, and the one-slim-shuffle plan shape."""

import numpy as np
from pyspark.sql import functions as F

from versatiles_rs_spark import queries as Q
from versatiles_rs_spark.functions.buckets import (
    SDXL_BUCKETS,
    assign_aspect_buckets,
    bucket_batches,
)


def _dims(spark, n=400):
    return spark.range(0, n, 1, 4).select(
        F.col("id").alias("image_id"),
        (F.lit(64) + F.pmod(F.col("id") * 193, F.lit(3001))).alias("w"),
        (F.lit(64) + F.pmod(F.col("id") * 389, F.lit(3001))).alias("h"),
    )


def test_bucket_assignment_matches_bruteforce(spark):
    rows = assign_aspect_buckets(_dims(spark)).collect()
    assert len(rows) == 400
    bw = np.array([b[0] for b in SDXL_BUCKETS], dtype=np.float64)
    bh = np.array([b[1] for b in SDXL_BUCKETS], dtype=np.float64)
    for r in rows:
        dist = np.abs(r.w / r.h - bw / bh)
        want = int(np.argmin(dist))  # argmin takes first (lowest index) on ties
        assert r.bucket_idx == want, (r.image_id, r.w, r.h, r.bucket_idx, want)
        assert (r.bucket_w, r.bucket_h) == SDXL_BUCKETS[want]


def test_square_and_extreme_aspects(spark):
    df = spark.createDataFrame(
        [(1, 1000, 1000), (2, 100, 4000), (3, 4000, 100)], "image_id long, w long, h long"
    )
    got = {r.image_id: (r.bucket_w, r.bucket_h) for r in assign_aspect_buckets(df).collect()}
    assert got[1] == (1024, 1024)
    assert got[2] == (512, 2048)  # clamps to the tallest bucket
    assert got[3] == (2048, 512)


def test_batch_assembly_invariants(spark):
    out = bucket_batches(
        assign_aspect_buckets(_dims(spark)), id_col="image_id", batch_size=8, n_shards=4
    ).collect()
    groups: dict = {}
    for r in out:
        groups.setdefault((r.bucket_idx, r.shard, r.batch_idx), []).append(r)
    for (b, s, bi), members in groups.items():
        assert len(members) <= 8
        assert sorted(m.batch_pos for m in members) == list(range(len(members)))
        # deterministic epoch order inside the batch
        ordered = sorted(members, key=lambda m: (m.wds_key, m.image_id))
        assert [m.batch_pos for m in ordered] == list(range(len(members)))
    # every (bucket, shard) has exactly one trailing partial batch at most
    for (b, s) in {(k[0], k[1]) for k in groups}:
        partial = [k for k in groups if k[:2] == (b, s) and len(groups[k]) < 8]
        full = [k for k in groups if k[:2] == (b, s) and len(groups[k]) == 8]
        assert len(partial) <= 1
        if partial:
            assert partial[0][2] == len(full)  # partial is the LAST batch


def test_plan_single_slim_shuffle_no_python(spark, sf_dir):
    df = Q.REGISTRY["aspect_buckets"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
