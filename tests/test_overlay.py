"""Areal interpolation (functions/overlay.py).  Ground truth: per-pair
python loop over all (src, tgt) rect pairs with exact integer overlap
and floor-quotient weights."""
import numpy as np

from versatiles_rs_spark.functions.overlay import areal_interpolate


def brute(srcs, tgts, scale=1000):
    out = {}
    for tid, tx0, tx1, ty0, ty1 in tgts:
        n = ov = est = 0
        for sid, sx0, sx1, sy0, sy1, val in srcs:
            w = min(sx1, tx1) - max(sx0, tx0)
            h = min(sy1, ty1) - max(sy0, ty0)
            if w > 0 and h > 0:
                n += 1
                ov += w * h
                est += val * w * h * scale // ((sx1 - sx0) * (sy1 - sy0))
        out[tid] = (n, ov, est)
    return out


def dfs(spark, srcs, tgts):
    s = spark.createDataFrame(
        srcs, "src_id long, x0 long, x1 long, y0 long, y1 long, value long"
    )
    t = spark.createDataFrame(tgts, "tgt_id long, x0 long, x1 long, y0 long, y1 long")
    return s, t


def rand_rect(rng, span, min_side=1, max_side=40):
    x0 = int(rng.integers(-span, span))
    y0 = int(rng.integers(-span, span))
    return x0, x0 + int(rng.integers(min_side, max_side)), \
        y0, y0 + int(rng.integers(min_side, max_side))


def test_areal_interp_matches_bruteforce(spark):
    rng = np.random.default_rng(31)
    srcs = [(i, *rand_rect(rng, 50), int(rng.integers(1, 500)))
            for i in range(12)]
    tgts = [(i, *rand_rect(rng, 50)) for i in range(40)]
    s, t = dfs(spark, srcs, tgts)
    got = {
        r["tgt_id"]: (r["n_src"], r["overlap_area"], r["est_milli"])
        for r in areal_interpolate(s, t).collect()
    }
    assert got == brute(srcs, tgts)


def test_areal_interp_edges(spark):
    # abutting rects (half-open): no overlap; containment: full value
    srcs = [(1, 0, 10, 0, 10, 77)]
    tgts = [
        (1, 10, 20, 0, 10),   # abuts on the right edge -> no hit
        (2, -5, 15, -5, 15),  # contains the source -> full 77.000
        (3, 5, 6, 5, 6),      # 1x1 inside -> floor(77*1*1000/100)
    ]
    s, t = dfs(spark, srcs, tgts)
    got = {
        r["tgt_id"]: (r["n_src"], r["overlap_area"], r["est_milli"])
        for r in areal_interpolate(s, t).collect()
    }
    assert got == {1: (0, 0, 0), 2: (1, 100, 77000), 3: (1, 1, 770)}


def test_areal_interp_broadcasts_and_stays_jvm(spark):
    s, t = dfs(spark, [(1, 0, 10, 0, 10, 5)], [(1, 2, 4, 2, 4)])
    plan = areal_interpolate(s, t)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
