"""Fixed-round Lloyd k-means (functions/kmeans.py): exact replay + laws."""

import numpy as np
import pandas as pd

from versatiles_rs_spark.functions.kmeans import lloyd_kmeans


def brute(pts, seeds, rounds=4, k_pad=16):
    cent = dict(seeds)  # cid -> (cx, cy)
    for _ in range(rounds):
        buckets = {}
        for (x, y) in pts:
            packed = min(
                ((x - cx) ** 2 + (y - cy) ** 2) * k_pad + cid
                for cid, (cx, cy) in cent.items()
            )
            buckets.setdefault(packed % k_pad, []).append((x, y))
        cent = {
            cid: (
                sum(x for x, _ in v) // len(v),
                sum(y for _, y in v) // len(v),
            )
            for cid, v in buckets.items()
        }
    counts = {}
    for (x, y) in pts:
        packed = min(
            ((x - cx) ** 2 + (y - cy) ** 2) * k_pad + cid
            for cid, (cx, cy) in cent.items()
        )
        counts[packed % k_pad] = counts.get(packed % k_pad, 0) + 1
    return {cid: (counts[cid], cent[cid][0], cent[cid][1]) for cid in counts}


def run(spark, pts, seeds, rounds=4):
    pdf = pd.DataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], columns=["id", "x", "y"]
    )
    sdf = spark.createDataFrame(
        pd.DataFrame(
            [(c, cx, cy) for c, (cx, cy) in seeds], columns=["cid", "cx", "cy"]
        )
    )
    out = lloyd_kmeans(spark.createDataFrame(pdf), sdf, rounds=rounds).toPandas()
    return {
        int(r["cid"]): (int(r["n_points"]), int(r["cx"]), int(r["cy"]))
        for _, r in out.iterrows()
    }


def test_fuzz_exact_replay(spark):
    rng = np.random.default_rng(17)
    pts = [(int(x), int(y)) for x, y in rng.integers(0, 10_000, (200, 2))]
    seeds = [(j, (int(2000 + (j % 3) * 3000), int(2000 + (j // 3) * 4000)))
             for j in range(6)]
    assert run(spark, pts, seeds) == brute(pts, seeds)


def test_planted_clusters_recovered(spark):
    rng = np.random.default_rng(2)
    centers = [(1000, 1000), (9000, 1000), (5000, 9000)]
    pts = []
    for cx, cy in centers:
        pts += [
            (int(cx + dx), int(cy + dy))
            for dx, dy in rng.integers(-200, 200, (50, 2))
        ]
    seeds = [(0, (2000, 2000)), (1, (8000, 2000)), (2, (5000, 8000))]
    got = run(spark, pts, seeds)
    assert set(got) == {0, 1, 2}
    for cid, (cx, cy) in enumerate(centers):
        n, gx, gy = got[cid]
        assert n == 50 and abs(gx - cx) < 250 and abs(gy - cy) < 250


def test_empty_cluster_drops_and_stays_dropped(spark):
    pts = [(0, 0), (10, 0), (0, 10), (10, 10)]
    seeds = [(0, (5, 5)), (1, (100000, 100000))]  # seed 1 never wins
    got = run(spark, pts, seeds, rounds=3)
    assert set(got) == {0}
    assert got[0][0] == 4


def test_tie_breaks_to_smaller_cid(spark):
    pts = [(50, 0)]  # equidistant from both seeds
    seeds = [(3, (0, 0)), (5, (100, 0))]
    got = run(spark, pts, seeds, rounds=1)
    assert set(got) == {3}


def test_plan_cached_points_broadcast_no_python(spark, sf_dir):
    from versatiles_rs_spark import queries as Q

    df = Q.REGISTRY["kmeans_cells"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "PythonUDF" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "InMemoryTableScan" in plan  # points cached across rounds
    assert "SinglePartition" not in plan


# ---------------------------------------------------------------------------
# simplified silhouette
# ---------------------------------------------------------------------------

def _brute_silhouette(pts, cent, k_pad=16, scale=10**9):
    """Scalar replay of the documented epilogue: two smallest packed
    candidates -> (a2, b2) -> one-IEEE-op-per-step silhouette."""
    out = {}
    for (x, y) in pts:
        packs = sorted(
            ((x - cx) ** 2 + (y - cy) ** 2) * k_pad + cid
            for cid, (cx, cy) in cent.items()
        )
        m1, m2 = packs[0], packs[1]
        a = np.sqrt(np.float64(m1 // k_pad))
        b = np.sqrt(np.float64(m2 // k_pad))
        s = np.float64(0.0) if max(a, b) == 0.0 else (b - a) / max(a, b)
        sq = int(np.floor(s * np.float64(scale)))
        cid = m1 % k_pad
        n, tot = out.get(cid, (0, 0))
        out[cid] = (n + 1, tot + sq)
    return {
        cid: (n, tot, float(np.float64(tot) / n / np.float64(scale)))
        for cid, (n, tot) in out.items()
    }


def test_silhouette_matches_brute(spark):
    from versatiles_rs_spark.functions.kmeans import simplified_silhouette

    rng = np.random.RandomState(11)
    pts = [(int(x), int(y)) for x, y in rng.randint(0, 2000, size=(400, 2))]
    cent = {0: (100, 100), 1: (1500, 300), 2: (800, 1700), 3: (100, 100)}
    pdf = pd.DataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], columns=["id", "x", "y"]
    )
    cdf = spark.createDataFrame(
        pd.DataFrame(
            [(c, cx, cy) for c, (cx, cy) in cent.items()],
            columns=["cid", "cx", "cy"],
        )
    )
    got = {
        int(r["cid"]): (int(r["n_points"]), int(r["sum_silq"]), float(r["mean_sil"]))
        for _, r in simplified_silhouette(spark.createDataFrame(pdf), cdf)
        .toPandas().iterrows()
    }
    assert got == _brute_silhouette(pts, cent)
    # duplicate centroid (cid 3 == cid 0's coords): every tied point packs
    # to the smaller cid, so cid 3 must be absent — and s for a point AT
    # the shared centroid is 0 (guard), never NaN
    assert 3 not in got


def test_silhouette_separation_law(spark):
    """Well-separated tight blobs -> mean silhouette near 1; the same
    centroids over uniform noise score much lower."""
    from versatiles_rs_spark.functions.kmeans import simplified_silhouette

    rng = np.random.RandomState(5)
    cent = {0: (0, 0), 1: (10000, 10000)}
    cdf = spark.createDataFrame(
        pd.DataFrame([(c, cx, cy) for c, (cx, cy) in cent.items()],
                     columns=["cid", "cx", "cy"])
    )
    tight = [(int(v[0] % 2 * 10000 + v[1] % 50), int(v[0] % 2 * 10000 + v[2] % 50))
             for v in rng.randint(0, 10**6, size=(200, 3))]
    noise = [(int(x), int(y)) for x, y in rng.randint(0, 10000, size=(200, 2))]

    def mean_sil(pts):
        pdf = pd.DataFrame([(i, x, y) for i, (x, y) in enumerate(pts)],
                           columns=["id", "x", "y"])
        out = simplified_silhouette(spark.createDataFrame(pdf), cdf).toPandas()
        return float((out["sum_silq"].sum() / out["n_points"].sum()) / 1e9)

    assert mean_sil(tight) > 0.95
    assert mean_sil(noise) < 0.6
    # guard: a single centroid is a hard error, not a null column
    one = spark.createDataFrame(pd.DataFrame([(0, 0, 0)], columns=["cid", "cx", "cy"]))
    pdf = spark.createDataFrame(pd.DataFrame([(1, 5, 5)], columns=["id", "x", "y"]))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        simplified_silhouette(pdf, one)
