"""Heavy hitters (functions/heavy.py): exactness under capacity pressure
(the regime the toy-SF gate can't reach), the MG reduction itself, and the
plan gate — candidates broadcast, corpus never hash-shuffles."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.heavy import _mg_summary, heavy_hitters


def test_mg_summary_guarantee():
    """After reduction to capacity c, every value keeps count >= true - T
    where T is the subtracted threshold, and anything with true count > T
    survives (the MG guarantee the two-phase exactness rests on)."""
    rng = np.random.default_rng(5)
    vals = np.concatenate([np.repeat(i, 2 ** (10 - i)) for i in range(10)])
    rng.shuffle(vals)
    counts = pd.Series(vals).value_counts()
    red = _mg_summary(counts, capacity=4)
    assert len(red) <= 4
    # top values survive: 0 (1024), 1 (512), 2 (256)
    assert {0, 1, 2} <= set(red.index)
    for v in red.index:
        assert red[v] <= counts[v]


def test_heavy_hitters_exact_under_capacity_pressure(spark):
    """2000 distinct values in a zipf-ish profile, capacity=64 counters
    (far below cardinality), 16 partitions: the top-10 must still be
    EXACT — value set, counts, and tie-broken order."""
    rng = np.random.default_rng(17)
    heads = np.concatenate([np.repeat(v, 500 - 40 * v) for v in range(10)])
    tail = rng.integers(100, 2100, size=20_000)
    vals = np.concatenate([heads, tail])
    rng.shuffle(vals)
    pdf = pd.DataFrame({"k": vals.astype(np.int64)})
    df = spark.createDataFrame(pdf, schema="k long").repartition(16)
    got = [(r.value, r.n, r.rank) for r in heavy_hitters(df, "k", k=10, capacity=64).collect()]
    truth = pd.Series(vals).value_counts()
    tdf = truth.reset_index()
    tdf.columns = ["value", "n"]
    tdf = tdf.sort_values(["n", "value"], ascending=[False, True]).head(10)
    want = [(int(v), int(n), i + 1) for i, (v, n) in enumerate(zip(tdf.value, tdf.n))]
    assert got == want


def test_heavy_hitters_nulls_and_strings(spark):
    pdf = pd.DataFrame({"s": ["a"] * 5 + ["b"] * 3 + [None] * 4 + ["c"] * 3})
    df = spark.createDataFrame(pdf, schema="s string")
    got = [(r.value, r.n, r.rank) for r in heavy_hitters(df, "s", k=2).collect()]
    assert got == [("a", 5, 1), ("b", 3, 2)]  # nulls excluded, tie b<c broken


def test_heavy_hitters_plan_corpus_never_shuffled_wide(spark, sf_dir):
    """The only full-corpus pass is the Arrow summarize + the semi-join
    recount; the candidate side is broadcast, so no Exchange carries the
    raw corpus for the join."""
    from versatiles_rs_spark.queries import REGISTRY

    df = REGISTRY["heavy_hitters"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert plan.count("MapInPandas") == 1
