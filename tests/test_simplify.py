"""Douglas-Peucker simplification (functions/simplify.py): kernel
properties vs a recursive reference, tolerance monotonicity, degenerate
chords, and the one-shuffle plan shape."""

import numpy as np
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.simplify import dp_keep_mask, simplify_lines, zoom_eps


def _dp_reference(xs, ys, eps):
    """Plain recursive DP, same chord-distance formula."""
    keep = set()

    def rec(lo, hi):
        keep.add(lo)
        keep.add(hi)
        if hi - lo < 2:
            return
        ax, ay, bx, by = xs[lo], ys[lo], xs[hi], ys[hi]
        dx, dy = bx - ax, by - ay
        denom = (dx * dx + dy * dy) ** 0.5
        best_d, best_i = -1.0, None
        for i in range(lo + 1, hi):
            if denom == 0.0:
                d = ((xs[i] - ax) ** 2 + (ys[i] - ay) ** 2) ** 0.5
            else:
                d = abs(dx * (ay - ys[i]) - (ax - xs[i]) * dy) / denom
            if d > best_d:
                best_d, best_i = d, i
        if best_d > eps:
            rec(lo, best_i)
            rec(best_i, hi)

    rec(0, len(xs) - 1)
    return sorted(keep)


def test_dp_kernel_matches_reference_and_is_monotone():
    rng = np.random.default_rng(23)
    xs = np.cumsum(rng.standard_normal(200))
    ys = np.cumsum(rng.standard_normal(200))
    prev = None
    for eps in (0.0, 0.3, 1.0, 3.0, 10.0):
        kept = list(np.nonzero(dp_keep_mask(xs, ys, eps))[0])
        assert kept == _dp_reference(list(xs), list(ys), eps)
        assert kept[0] == 0 and kept[-1] == 199  # endpoints always survive
        if prev is not None:
            assert len(kept) <= len(prev)  # coarser eps keeps fewer
        prev = kept
    assert len(prev) < 200  # eps=10 actually simplified something


def test_dp_degenerate_and_tiny():
    # closed loop: chord endpoints coincide -> euclidean fallback
    xs = np.array([0.0, 1.0, 1.0, 0.0, 0.0])
    ys = np.array([0.0, 0.0, 1.0, 1.0, 0.0])
    kept = np.nonzero(dp_keep_mask(xs, ys, 0.5))[0]
    assert 0 in kept and 4 in kept and len(kept) >= 3
    assert list(np.nonzero(dp_keep_mask(xs[:2], ys[:2], 99))[0]) == [0, 1]
    assert dp_keep_mask(np.array([]), np.array([]), 1).tolist() == []


def test_zoom_eps_is_pixel_scaled():
    assert zoom_eps(0) == 360.0 / 256
    assert zoom_eps(8) == 360.0 / 256 / 256
    assert zoom_eps(8, px=2.0) == 2 * zoom_eps(8)


def test_simplify_plan_one_shuffle_then_arrow(spark, sf_dir):
    """Line assembly = one groupBy exchange (JVM collect_list/sort_array);
    the DP kernel is the only Python stage."""
    from versatiles_rs_spark.queries import REGISTRY

    df = REGISTRY["simplify_lines"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert plan.count("Exchange hashpartitioning") == 1
