"""Exact Euclidean distance transform + allocation (functions/edt.py).

Ground truth: per-cell brute-force argmin over ALL features of the
packed lexicographic key K*d^2 + id — O(n^2 * f) numpy, independent of
the two-pass separable implementation.
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.edt import (
    _envelope_row,
    euclidean_distance,
)

K = 1 << 20


def brute(n, feats, md2=None):
    """feats: list of (gx, gy, src). Returns (d2, src) arrays [gy][gx];
    -1/-1 where unreached."""
    d2 = np.full((n, n), -1, dtype=np.int64)
    src = np.full((n, n), -1, dtype=np.int64)
    if not feats:
        return d2, src
    gxs = np.arange(n)
    best = np.full((n, n), np.iinfo(np.int64).max, dtype=np.int64)
    for fx, fy, fid in feats:
        dx = gxs[None, :] - fx
        dy = gxs[:, None] - fy
        p = K * (dx * dx + dy * dy) + fid
        np.minimum(best, p, out=best)
    dd = best // K
    reach = np.ones((n, n), dtype=bool) if md2 is None else dd <= md2
    d2[reach] = dd[reach]
    src[reach] = (best - dd * K)[reach]
    return d2, src


def feats_df(spark, feats):
    return spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in feats],
        "gx long, gy long, src_id long",
    )


def collect_cells(df):
    rows = df.collect()
    n = int(max(r["gx"] for r in rows)) + 1
    d2 = np.full((n, n), -99, dtype=np.int64)
    src = np.full((n, n), -99, dtype=np.int64)
    for r in rows:
        d2[r["gy"], r["gx"]] = r["d2"]
        src[r["gy"], r["gx"]] = r["src"]
    return d2, src


def test_envelope_matches_brute_min():
    rng = np.random.default_rng(3)
    for _ in range(50):
        m = rng.integers(1, 12)
        a = np.sort(rng.choice(64, size=m, replace=False)).astype(np.int64)
        h = rng.integers(0, K * 100, size=m).astype(np.int64)
        got = _envelope_row(a, h, 64, K)
        xs = np.arange(64, dtype=np.int64)
        exp = (K * (xs[:, None] - a[None, :]) ** 2 + h[None, :]).min(axis=1)
        assert (got == exp).all()


def test_edt_cells_match_bruteforce(spark):
    rng = np.random.default_rng(11)
    n = 64
    feats = [
        (int(x), int(y), int(i))
        for i, (x, y) in enumerate(zip(rng.integers(0, n, 15), rng.integers(0, n, 15)))
    ]
    d2, src = collect_cells(euclidean_distance(feats_df(spark, feats), n))
    ed2, esrc = brute(n, feats)
    assert (d2 == ed2).all() and (src == esrc).all()


def test_edt_tie_breaks_to_min_id(spark):
    # two features equidistant from the midline: min src_id must win
    feats = [(2, 8, 7), (14, 8, 3)]
    d2, src = collect_cells(euclidean_distance(feats_df(spark, feats), 16))
    # x = 8 is equidistant (d=6 from both): id 3 wins
    assert src[8, 8] == 3 and d2[8, 8] == 36
    # duplicate cell collapses to min id
    feats = [(5, 5, 9), (5, 5, 4)]
    d2, src = collect_cells(euclidean_distance(feats_df(spark, feats), 8))
    assert (src != 9).all() and src[5, 5] == 4 and d2[5, 5] == 0


def test_edt_max_dist_and_empty(spark):
    feats = [(0, 0, 1)]
    d2, src = collect_cells(euclidean_distance(feats_df(spark, feats), 16, max_dist=4))
    ed2, esrc = brute(16, feats, md2=16)
    assert (d2 == ed2).all() and (src == esrc).all()
    assert d2[15, 15] == -1 and src[15, 15] == -1
    # no features at all: everything unreached, full coverage
    empty = feats_df(spark, []).filter(F.lit(False))
    d2, src = collect_cells(euclidean_distance(empty, 8))
    assert (d2 == -1).all() and (src == -1).all()


def test_edt_block_aggregates_match_cells(spark):
    rng = np.random.default_rng(5)
    n, B = 64, 16
    feats = [
        (int(x), int(y), int(i))
        for i, (x, y) in enumerate(zip(rng.integers(0, n, 9), rng.integers(0, n, 9)))
    ]
    blocks = {
        (r["bx"], r["by"]): r
        for r in euclidean_distance(
            feats_df(spark, feats), n, block=B, max_dist=20
        ).collect()
    }
    d2, src = brute(n, feats, md2=400)
    assert len(blocks) == (n // B) ** 2
    for by in range(n // B):
        for bx in range(n // B):
            sl = np.s_[by * B : (by + 1) * B, bx * B : (bx + 1) * B]
            dd, ss = d2[sl], src[sl]
            reach = dd >= 0
            r = blocks[(bx, by)]
            assert r["n_reached"] == int(reach.sum())
            assert r["n_unreached"] == B * B - int(reach.sum())
            assert r["sum_d2"] == int(dd[reach].sum())
            assert r["max_d2"] == (int(dd[reach].max()) if reach.any() else -1)
            assert r["sum_src"] == int(ss[reach].sum())


def test_edt_shuffles_slim_rows_only(spark):
    feats = feats_df(spark, [(1, 1, 0), (30, 30, 1)])
    plan = (
        euclidean_distance(feats, 32, block=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # no wide columns anywhere: the relation is (long, long, long) end to end
    assert "bytes#" not in plan and "CartesianProduct" not in plan
