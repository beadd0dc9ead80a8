"""Dataset profiler (functions/profile.py): exact stats with planted
nulls, approx (HLL + digest) scale path accuracy, and the plan gates —
one aggregate pass, and the approx path must not plan an Expand (the
count(DISTINCT a), count(DISTINCT b) row-multiplier)."""

import pandas as pd
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.profile import profile_table


def _as_map(rows):
    return {(r.col, r.stat): r.value for r in rows}


def test_profile_exact_with_nulls(spark):
    pdf = pd.DataFrame(
        {
            "x": [1.0, 2.0, None, 4.0, 10.0],
            "s": ["aa", None, "cccc", "dd", "e"],
            "c": ["u", "u", None, "v", "w"],
        }
    )
    df = spark.createDataFrame(pdf, schema="x double, s string, c string")
    m = _as_map(profile_table(df, numeric=["x"], strings=["s"], categorical=["c"]).collect())
    assert m[("*", "rows")] == 5
    assert m[("x", "count")] == 4 and m[("x", "nulls")] == 1
    assert m[("x", "n_distinct")] == 4
    assert m[("x", "min")] == 1.0 and m[("x", "max")] == 10.0
    assert m[("x", "mean")] == 4.25
    assert m[("x", "p50")] == 3.0  # interpolated between 2 and 4
    assert m[("s", "nulls")] == 1
    assert m[("s", "len_min")] == 1 and m[("s", "len_max")] == 4
    assert m[("s", "len_avg")] == 2.25
    assert m[("c", "n_distinct")] == 3 and m[("c", "nulls")] == 1


def test_profile_approx_path_accuracy_and_plan(spark, sf_dir):
    """The exact=False path: HLL distincts within the 1.5% rsd envelope,
    digest percentiles near exact, and NO Expand node in the plan (the
    exact multi-distinct rewrite that multiplies every input row by the
    number of distinct aggregates — the thing that can't ship at 10^12)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = profile_table(docs, numeric=["n_chars"], categorical=["lang", "source"])
    approx = profile_table(
        docs, numeric=["n_chars"], categorical=["lang", "source"], exact=False
    )
    em, am = _as_map(exact.collect()), _as_map(approx.collect())
    for key in [("n_chars", "n_distinct"), ("lang", "n_distinct"), ("source", "n_distinct")]:
        assert abs(am[key] - em[key]) <= max(3, 0.05 * em[key]), key
    for key in [("n_chars", "p50"), ("n_chars", "p95")]:
        assert abs(am[key] - em[key]) <= 0.01 * max(1.0, em[key]), key
    exact_plan = exact._jdf.queryExecution().executedPlan().toString()
    approx_plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan  # the exact multi-distinct really plans one
    assert "Expand" not in approx_plan
    # both paths: a single two-stage aggregate, nothing Python; the only
    # exchange is the 1-row SinglePartition merge (never a hash shuffle
    # of the input)
    assert "Python" not in approx_plan and "Python" not in exact_plan
    for line in approx_plan.splitlines():
        if "Exchange" in line:
            assert "SinglePartition" in line, line
