"""Viewshed (operators/viewshed.py).

Ground truth is a per-cell brute-force line-of-sight walk implemented
independently of the ring-vectorized kernel: for each target, step
k = 1..n-1, take the max of the straddling cells at the fractional
minor coordinate, and compare angles by int cross-multiplication.  The
kernel must match it bit for bit on random DEMs, and the Spark operator
(tile clipping -> window assembly -> kernel) must match the kernel on
the analytic ridge DEM, including a world-edge-clipped observer.
"""
import numpy as np
import pytest

from versatiles_rs_spark import fixtures
from versatiles_rs_spark.operators.viewshed import viewshed, viewshed_kernel


def brute_viewshed(elev: np.ndarray, r0: int, c0: int, radius: int,
                   height: int) -> np.ndarray:
    H, W = elev.shape
    vis = np.zeros((H, W), dtype=bool)
    e0 = int(elev[r0, c0]) + height
    for r in range(H):
        for c in range(W):
            if elev[r, c] < 0:
                continue
            n = max(abs(r - r0), abs(c - c0))
            if n > radius:
                continue
            if n <= 1:
                vis[r, c] = True
                continue
            dx, dy = c - c0, r - r0
            et = int(elev[r, c])
            ok = True
            for k in range(1, n):
                kx, ky = k * dx, k * dy
                xs = {kx // n, -((-kx) // n)}
                ys = {ky // n, -((-ky) // n)}
                ek = max(int(elev[r0 + y][c0 + x]) for x in xs for y in ys)
                if not (ek - e0) * n < (et - e0) * k:
                    ok = False
                    break
            vis[r, c] = ok
    return vis


def test_kernel_matches_brute_force_random():
    rng = np.random.default_rng(7)
    for trial in range(6):
        size = 41
        elev = rng.integers(0, 30, size=(size, size)).astype(np.int64)
        if trial % 2:  # add a wall to force real occlusion
            elev[:, 18] += 40
        r0 = c0 = size // 2
        radius, height = 20, int(trial % 3)
        got = viewshed_kernel(elev, r0, c0, radius, height)
        want = brute_viewshed(elev, r0, c0, radius, height)
        assert np.array_equal(got, want)


def test_kernel_flat_plane_all_visible():
    elev = np.full((21, 21), 5, dtype=np.int64)
    vis = viewshed_kernel(elev, 10, 10, 10, 1)
    assert vis.all()  # raised eye over a flat plane sees everything


def test_kernel_flat_plane_zero_height_grazing():
    # at eye height 0 over a flat plane the sightline lies ON the
    # terrain: strict clearance fails beyond the 8-neighborhood
    elev = np.full((21, 21), 5, dtype=np.int64)
    vis = viewshed_kernel(elev, 10, 10, 10, 0)
    assert vis[9:12, 9:12].all()
    assert vis.sum() == 9


def test_kernel_wall_shadow():
    elev = np.zeros((31, 31), dtype=np.int64)
    elev[:, 20] = 50  # tall north-south wall east of the observer
    vis = viewshed_kernel(elev, 15, 15, 15, 2)
    assert vis[15, 20]          # the wall crest itself is visible
    assert not vis[15, 21:].any()  # everything behind it is shadowed
    assert vis[15, :20].all()   # everything in front is clear


def test_kernel_sentinel_clipping():
    elev = np.full((21, 21), 3, dtype=np.int64)
    elev[:, :5] = -1  # outside-world strip
    vis = viewshed_kernel(elev, 10, 10, 10, 2)
    assert not vis[:, :5].any()
    assert vis[10, 5]


@pytest.fixture(scope="module")
def ridge_tiles(spark):
    return fixtures.dem_raster_df(spark, zoom=1, partitions=4).localCheckpoint()


def test_spark_matches_kernel_on_ridge_dem(spark, ridge_tiles):
    # global elevation grid straight from the fixture's closed form
    gx = np.arange(512, dtype=np.int64)
    world = fixtures.dem_value(gx[None, :], gx[:, None])
    observers = [(1, 256, 256), (2, 100, 400), (3, 30, 30)]  # 3 clips at edge
    radius, height = 48, 3
    out = viewshed(ridge_tiles, observers, radius=radius, height=height)
    got = {
        (int(r["oid"]), int(r["gx"]), int(r["gy"])): int(r["visible"])
        for r in out.collect()
    }
    n_expected = 0
    for oid, ox, oy in observers:
        x0, x1 = max(ox - radius, 0), min(ox + radius + 1, 512)
        y0, y1 = max(oy - radius, 0), min(oy + radius + 1, 512)
        pad = np.full((2 * radius + 1, 2 * radius + 1), -1, dtype=np.int64)
        pad[y0 - (oy - radius) : y1 - (oy - radius),
            x0 - (ox - radius) : x1 - (ox - radius)] = world[y0:y1, x0:x1]
        want = viewshed_kernel(pad, radius, radius, radius, height)
        n_expected += (x1 - x0) * (y1 - y0)
        for gy in range(y0, y1):
            for gx_ in range(x0, x1):
                w = bool(want[gy - (oy - radius), gx_ - (ox - radius)])
                assert got[(oid, gx_, gy)] == int(w), (oid, gx_, gy)
    assert len(got) == n_expected  # clipped window emits only world cells
    # sanity: real occlusion happens on the ridge DEM
    assert 0 < sum(got.values()) < len(got)
