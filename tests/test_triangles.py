"""Triangle counting (functions/triangles.py): brute-force parity + laws."""

import itertools

import numpy as np
import pandas as pd

from versatiles_rs_spark.functions.triangles import triangle_counts


def brute(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in es for n in e})
    deg = {n: sum(1 for e in es if n in e) for n in nodes}
    tri_per = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (a, c) in es and (b, c) in es:
            for n in (a, b, c):
                tri_per[n] += 1
    out = {}
    for n in nodes:
        if tri_per[n] == 0:
            continue
        d = deg[n]
        cc = (tri_per[n] * 2 * 10**6) // (d * (d - 1)) if d > 1 else 0
        out[n] = (d, tri_per[n], cc)
    return out


def run(spark, edges):
    pdf = pd.DataFrame(
        [tuple(sorted(e)) for e in edges if e[0] != e[1]], columns=["a", "b"]
    )
    got = triangle_counts(spark.createDataFrame(pdf)).toPandas()
    return {
        int(r["node"]): (int(r["degree"]), int(r["n_triangles"]),
                         int(r["clustering_ppm"]))
        for _, r in got.iterrows()
    }


def test_fuzz_parity(spark):
    rng = np.random.default_rng(13)
    for trial in range(3):
        n = 20
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, (60, 2)) if a != b
        ]
        assert run(spark, edges) == brute(edges), trial


def test_k4_and_cycle(spark):
    # K4: each node has degree 3, sits in 3 triangles, coefficient 1.0
    k4 = list(itertools.combinations(range(4), 2))
    got = run(spark, k4)
    assert got == {n: (3, 3, 1_000_000) for n in range(4)}
    # a 5-cycle has no triangles at all -> empty result
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    assert run(spark, cyc) == {}


def test_hub_with_one_closed_wedge(spark):
    # star hub 0 with leaves 1..5 plus one leaf-leaf edge (1,2):
    # exactly one triangle (0,1,2); hub coefficient 2/(5*4) ppm
    edges = [(0, i) for i in range(1, 6)] + [(1, 2)]
    got = run(spark, edges)
    assert got[0] == (5, 1, 2 * 10**6 // 20)
    assert got[1] == (2, 1, 1_000_000)
    assert got[2] == (2, 1, 1_000_000)
    assert 3 not in got


def test_plan_oriented_cached_no_python(spark, sf_dir):
    from versatiles_rs_spark import queries as Q

    df = Q.REGISTRY["cell_triangles"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "PythonUDF" not in plan
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan  # oriented edges cached across 3 refs
