"""FRAGSTATS class metrics (functions/landscape.py): brute-force parity.

Reference: per-cell python BFS labeling + side counting over the raw
grid — the engine must reproduce it from the contracted segment relation
exactly."""

from collections import deque

import numpy as np
import pandas as pd

from versatiles_rs_spark.functions.landscape import class_metrics


def brute(grid: np.ndarray):
    n, m = grid.shape  # rows (gy), cols (gx); engine assumes square n==m
    lab = -np.ones_like(grid)
    patches = {}  # label -> (v, cells)
    nxt = 0
    for y in range(n):
        for x in range(m):
            if lab[y, x] >= 0:
                continue
            v = grid[y, x]
            q, cells = deque([(y, x)]), 0
            lab[y, x] = nxt
            while q:
                cy, cx = q.popleft()
                cells += 1
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ny, nx_ = cy + dy, cx + dx
                    if 0 <= ny < n and 0 <= nx_ < m and lab[ny, nx_] < 0 and grid[ny, nx_] == v:
                        lab[ny, nx_] = nxt
                        q.append((ny, nx_))
            patches[nxt] = (v, cells)
            nxt += 1
    te = {}
    for y in range(n):
        for x in range(m):
            v = grid[y, x]
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ny, nx_ = y + dy, x + dx
                if not (0 <= ny < n and 0 <= nx_ < m):
                    te[v] = te.get(v, 0) + 1  # landscape boundary side
                elif grid[ny, nx_] != v:
                    te[v] = te.get(v, 0) + 1
    out = {}
    for v in np.unique(grid):
        sizes = [c for (pv, c) in patches.values() if pv == v]
        tot, np_, big = sum(sizes), len(sizes), max(sizes)
        area = n * m
        out[int(v)] = dict(
            n_patches=np_, class_cells=tot, largest=big,
            total_edge=te.get(v, 0),
            pland_ppm=tot * 1_000_000 // area,
            lpi_ppm=big * 1_000_000 // area,
            mps_milli=tot * 1000 // np_,
            ed_ppm=te.get(v, 0) * 1_000_000 // area,
        )
    return out


def run(spark, grid):
    n = grid.shape[0]
    ys, xs = np.mgrid[0:n, 0:n]
    pdf = pd.DataFrame(
        {"gx": xs.ravel(), "gy": ys.ravel(), "v": grid.ravel()}
    )
    got = class_metrics(spark.createDataFrame(pdf), n).toPandas()
    return {int(r["v"]): r for _, r in got.iterrows()}


COLS = ["n_patches", "class_cells", "largest", "total_edge",
        "pland_ppm", "lpi_ppm", "mps_milli", "ed_ppm"]


def test_random_fuzz_parity(spark):
    rng = np.random.default_rng(5)
    for trial in range(3):
        grid = rng.integers(0, 3, (16, 16))
        got, want = run(spark, grid), brute(grid)
        assert set(got) == set(want), trial
        for v in want:
            for c in COLS:
                assert got[v][c] == want[v][c], (trial, v, c)


def test_checkerboard_all_singletons(spark):
    n = 8
    grid = (np.add.outer(np.arange(n), np.arange(n)) % 2).astype(np.int64)
    got = run(spark, grid)
    for v in (0, 1):
        assert got[v]["n_patches"] == n * n // 2
        assert got[v]["largest"] == 1
        # every cell's 4 sides are edges (neighbors differ or boundary)
        assert got[v]["total_edge"] == 4 * (n * n // 2)


def test_uniform_single_patch_edge_is_perimeter(spark):
    n = 8
    grid = np.zeros((n, n), dtype=np.int64)
    got = run(spark, grid)
    assert got[0]["n_patches"] == 1
    assert got[0]["class_cells"] == n * n
    assert got[0]["total_edge"] == 4 * n
    assert got[0]["pland_ppm"] == 1_000_000
    assert got[0]["lpi_ppm"] == 1_000_000


def brute_joins(grid: np.ndarray):
    n = grid.shape[0]
    out = {}
    for y in range(n):
        for x in range(n):
            for dy, dx in ((0, 1), (1, 0)):  # each rook join once
                ny, nx_ = y + dy, x + dx
                if ny < n and nx_ < n:
                    va, vb = sorted((int(grid[y, x]), int(grid[ny, nx_])))
                    out[(va, vb)] = out.get((va, vb), 0) + 1
    return out


def test_join_counts_fuzz_parity(spark):
    from versatiles_rs_spark.functions.landscape import join_counts

    rng = np.random.default_rng(9)
    for trial in range(3):
        n = 12
        grid = rng.integers(0, 3, (n, n))
        ys, xs = np.mgrid[0:n, 0:n]
        pdf = pd.DataFrame({"gx": xs.ravel(), "gy": ys.ravel(), "v": grid.ravel()})
        got = join_counts(spark.createDataFrame(pdf), n).toPandas()
        want = brute_joins(grid)
        gotd = {(int(r["va"]), int(r["vb"])): int(r["n_joins"]) for _, r in got.iterrows()}
        assert gotd == want, trial
        # total joins on a complete lattice is the closed form 2n(n-1)
        assert sum(gotd.values()) == 2 * n * (n - 1), trial
        # expectation: exact ppm quotient per pair
        counts = {int(v): int((grid == v).sum()) for v in np.unique(grid)}
        big_n, j = n * n, 2 * n * (n - 1)
        for _, r in got.iterrows():
            va, vb = int(r["va"]), int(r["vb"])
            if va == vb:
                e = j * counts[va] * (counts[va] - 1) * 10**6 // (big_n * (big_n - 1))
            else:
                e = 2 * j * counts[va] * counts[vb] * 10**6 // (big_n * (big_n - 1))
            assert int(r["expected_ppm"]) == e, (trial, va, vb)


def test_shannon_diversity_matches_float_entropy(spark):
    """shannon_diversity: the fixed-point SHDI must sit within 2^-18 of
    the float log2 entropy, and SHEI within ~3e-5 of the float ratio;
    uniform 4-class landscape gives SHDI = 2.0 bits and SHEI = 1.0
    exactly (power-of-two counts have exact fixed-point logs)."""
    import math

    from versatiles_rs_spark.functions.landscape import shannon_diversity

    def run(grid, n):
        ys, xs = np.mgrid[0:n, 0:n]
        pdf = pd.DataFrame({"gx": xs.ravel(), "gy": ys.ravel(), "v": grid.ravel()})
        return shannon_diversity(spark.createDataFrame(pdf), n).collect()[0]

    n = 16
    # uniform 4 classes in quadrants
    grid = (np.add.outer(np.arange(n) // 8, 2 * (np.arange(n) // 8)).T).astype(np.int64)
    r = run(grid, n)
    assert r["n_classes"] == 4
    assert r["shdi_fp"] == 2 * (1 << 20)
    assert r["shei_ppm"] == 1_000_000

    rng = np.random.default_rng(3)
    grid = rng.integers(0, 5, (n, n))
    r = run(grid, n)
    counts = [int((grid == v).sum()) for v in np.unique(grid)]
    big = n * n
    want = math.log2(big) - sum(c * math.log2(c) for c in counts) / big
    got = r["shdi_fp"] / (1 << 20)
    assert abs(got - want) < 4e-6, (got, want)
    want_shei = want / math.log2(len(counts))
    assert abs(r["shei_ppm"] / 1e6 - want_shei) < 5e-5
