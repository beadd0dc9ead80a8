"""Horizon angles (operators/horizon.py).

Ground truth is the quadratic global evaluation: for every cell, the max
quantized tangent over ALL same-row cells in the ray direction, one
numpy grid, no segments, no hulls.  The distributed hull-merge solve
must match it bit for bit across super-tile splits and both
directions."""
import numpy as np
import pytest

from versatiles_rs_spark.operators.horizon import (
    SCALE,
    horizon_angle,
    local_horizon,
    merge_hull,
    row_upper_hulls,
)

from test_hydro_fuzz import dem_to_tiles


def brute_horizon(e: np.ndarray, direction: str = "W") -> np.ndarray:
    v = e.T if direction in ("N", "S") else e
    if direction in ("E", "S"):
        v = v[:, ::-1]
    q = np.maximum(local_horizon(v.astype(np.int64)), 0)
    if direction in ("E", "S"):
        q = q[:, ::-1]
    return q.T if direction in ("N", "S") else q


def test_local_matches_pairwise_loop():
    rng = np.random.default_rng(5)
    e = rng.integers(0, 40, size=(6, 50)).astype(np.int64)
    got = local_horizon(e)
    for r in range(6):
        for c in range(50):
            want = -(1 << 62)
            for w in range(c):
                want = max(want, (int(e[r, w]) - int(e[r, c])) * SCALE // (c - w))
            assert got[r, c] == want


def test_hull_merge_equals_full_scan():
    """max over hull points == max over ALL western points, quantized —
    the tangency + monotone-floor argument, checked empirically."""
    rng = np.random.default_rng(9)
    for _ in range(20):
        west = rng.integers(0, 60, size=32).astype(np.int64)
        cells_e = rng.integers(0, 60, size=16).astype(np.int64)
        xs = np.arange(40, 56, dtype=np.int64)  # east of all west points
        hull = row_upper_hulls(west[None, :], 0)
        hx = np.array([h[1] for h in hull], dtype=np.int64)
        hy = np.array([h[2] for h in hull], dtype=np.int64)
        got = merge_hull(cells_e, xs, hx, hy)
        wx = np.arange(32, dtype=np.int64)
        want = (
            ((west[None, :] - cells_e[:, None]) * SCALE)
            // (xs[:, None] - wx[None, :])
        ).max(axis=1)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "seed,s,direction",
    [(21, 1, "W"), (22, 2, "W"), (23, 2, "E"), (24, 4, "W"),
     (25, 2, "N"), (26, 2, "S")],
)
def test_fuzz_distributed_matches_global(spark, seed, s, direction):
    n, ts = 64, 16
    rng = np.random.default_rng(seed)
    e = rng.integers(0, 50, size=(n, n)).astype(np.int64)
    want = brute_horizon(e, direction)
    pdf = horizon_angle(
        dem_to_tiles(spark, e, ts), tile_size=ts, super_tiles=s,
        direction=direction,
    ).toPandas()
    assert len(pdf) == n * n
    got = np.zeros((n, n), dtype=np.int64)
    got[pdf["gy"].to_numpy(), pdf["gx"].to_numpy()] = pdf["horizon"].to_numpy()
    np.testing.assert_array_equal(got, want)


def test_wall_shadow_closed_form(spark):
    """A single 40-high wall column: every cell east of it at distance d
    sees horizon floor((40 - e) * 2^16 / d); in front of it, 0."""
    n, ts = 32, 16
    e = np.zeros((n, n), dtype=np.int64)
    e[:, 10] = 40
    pdf = horizon_angle(
        dem_to_tiles(spark, e, ts), tile_size=ts, super_tiles=1, direction="W"
    ).toPandas()
    got = np.zeros((n, n), dtype=np.int64)
    got[pdf["gy"].to_numpy(), pdf["gx"].to_numpy()] = pdf["horizon"].to_numpy()
    for c in range(n):
        if c <= 10:
            assert (got[:, c] == 0).all()
        else:
            assert (got[:, c] == 40 * SCALE // (c - 10)).all()
