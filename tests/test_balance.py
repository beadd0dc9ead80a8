"""Furness/IPF balancing (functions/balance.py): exact replay + law.

The numpy/python reference replays the fixed-point half-steps
bit-for-bit; a consistency law checks that with CONSISTENT targets the
balanced row sums land within floor-residue distance of target*1000."""

import numpy as np
import pandas as pd

from versatiles_rs_spark.functions.balance import furness_balance


def brute(seed, rt, ct, rounds=3):
    w = {(o, d): wv * 1000 for (o, d), wv in seed.items()}
    for _ in range(rounds):
        rs = {}
        for (o, d), wv in w.items():
            rs[o] = rs.get(o, 0) + wv
        w = {k: (wv * (rt[k[0]] * 1000)) // rs[k[0]] for k, wv in w.items()}
        cs = {}
        for (o, d), wv in w.items():
            cs[d] = cs.get(d, 0) + wv
        w = {k: (wv * (ct[k[1]] * 1000)) // cs[k[1]] for k, wv in w.items()}
    return w


def run(spark, seed, rt, ct, rounds=3):
    sdf = spark.createDataFrame(
        pd.DataFrame([(o, d, w) for (o, d), w in seed.items()], columns=["o", "d", "w"])
    )
    rdf = spark.createDataFrame(
        pd.DataFrame(list(rt.items()), columns=["o", "t"])
    )
    cdf = spark.createDataFrame(
        pd.DataFrame(list(ct.items()), columns=["d", "t"])
    )
    out = furness_balance(sdf, rdf, cdf, rounds=rounds).toPandas()
    return {(int(r["o"]), int(r["d"])): int(r["w_milli"]) for _, r in out.iterrows()}


def test_fuzz_exact_replay(spark):
    rng = np.random.default_rng(21)
    no, nd = 6, 7
    seed = {
        (o, d): int(rng.integers(1, 50))
        for o in range(no) for d in range(nd) if rng.random() < 0.7
    }
    rt = {o: int(rng.integers(50, 400)) for o in range(no)}
    ct = {d: int(rng.integers(50, 400)) for d in range(nd)}
    assert run(spark, seed, rt, ct) == brute(seed, rt, ct)


def test_consistent_targets_converge_to_rows_and_cols(spark):
    """Doubly-stochastic-style case: targets ARE consistent (ΣO == ΣD),
    so after a few rounds row sums sit within len(row) floor residues of
    t*1000 and column sums within ~per-entry residue of t*1000."""
    rng = np.random.default_rng(4)
    n = 5
    seed = {(o, d): int(rng.integers(1, 20)) for o in range(n) for d in range(n)}
    rt = {o: 100 for o in range(n)}
    ct = {d: 100 for d in range(n)}
    got = run(spark, seed, rt, ct, rounds=5)
    for d in range(n):
        cs = sum(v for (o, dd), v in got.items() if dd == d)
        assert abs(cs - 100_000) <= n  # last step was a column fit
    for o in range(n):
        rs = sum(v for (oo, d), v in got.items() if oo == o)
        assert abs(rs - 100_000) <= 2_000  # within 2% after 5 rounds


def test_plan_linear_no_python(spark, sf_dir):
    from versatiles_rs_spark import queries as Q

    df = Q.REGISTRY["od_balance"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "PythonUDF" not in plan
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    # linear lineage: every reference to the seed (w0 + per-round target
    # joins) reads the CACHED relation — the FileScan occurrences in the
    # plan text are the InMemoryRelations printing their stored child
    # plan, one per cache reference, never a live re-scan
    assert plan.count("InMemoryTableScan") == plan.count("FileScan")