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


# ---------------------------------------------------------------------------
# dissolve_area: union-of-rects area per group
# ---------------------------------------------------------------------------

def _union_area_brute(rects):
    """Exact union area by cell rasterization over the integer grid
    (small extents only)."""
    if not rects:
        return 0
    import numpy as np
    x0 = min(r[0] for r in rects); x1 = max(r[1] for r in rects)
    y0 = min(r[2] for r in rects); y1 = max(r[3] for r in rects)
    g = np.zeros((y1 - y0, x1 - x0), dtype=bool)
    for rx0, rx1, ry0, ry1 in rects:
        g[ry0 - y0 : ry1 - y0, rx0 - x0 : rx1 - x0] = True
    return int(g.sum())


def test_dissolve_area_matches_rasterized_union(spark):
    import numpy as np
    from versatiles_rs_spark.functions.overlay import dissolve_area

    rng = np.random.default_rng(61)
    rows = []
    groups = {}
    for gid in range(6):
        rects = []
        for _ in range(rng.integers(1, 9)):
            x0 = int(rng.integers(0, 60)); y0 = int(rng.integers(0, 60))
            w = int(rng.integers(1, 25)); h = int(rng.integers(1, 25))
            rects.append((x0, x0 + w, y0, y0 + h))
            rows.append((gid, x0, x0 + w, y0, y0 + h))
        groups[gid] = rects
    df = spark.createDataFrame(rows, "gid long, x0 long, x1 long, y0 long, y1 long")
    got = {r["gid"]: r["union_area"] for r in dissolve_area(df).collect()}
    assert got == {g: _union_area_brute(rs) for g, rs in groups.items()}


def test_dissolve_area_cases(spark):
    from versatiles_rs_spark.functions.overlay import dissolve_area

    rows = [
        # gid 1: identical duplicates -> counted once
        (1, 0, 10, 0, 10), (1, 0, 10, 0, 10),
        # gid 2: abutting halves (half-open) -> seamless union
        (2, 0, 5, 0, 10), (2, 5, 10, 0, 10),
        # gid 3: containment
        (3, 0, 10, 0, 10), (3, 2, 4, 2, 4),
        # gid 4: disjoint islands
        (4, 0, 2, 0, 2), (4, 10, 12, 10, 12),
    ]
    df = spark.createDataFrame(rows, "gid long, x0 long, x1 long, y0 long, y1 long")
    got = {
        r["gid"]: (r["n_rects"], r["union_area"]) for r in dissolve_area(df).collect()
    }
    assert got == {1: (2, 100), 2: (2, 100), 3: (2, 100), 4: (2, 8)}


def test_dissolve_area_stays_jvm(spark):
    from versatiles_rs_spark.functions.overlay import dissolve_area

    df = spark.createDataFrame(
        [(1, 0, 4, 0, 4)], "gid long, x0 long, x1 long, y0 long, y1 long"
    )
    plan = dissolve_area(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
