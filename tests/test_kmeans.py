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
