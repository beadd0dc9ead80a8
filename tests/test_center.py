"""Mean/median center (functions/center.py): exact replay + robustness.

The numpy reference replays the integer-weighted Weiszfeld rounds
bit-for-bit (floor weights, integer sums, floor division) — any
deviation in the engine's round structure shows up immediately."""

import math

import numpy as np
import pandas as pd

from versatiles_rs_spark.functions.center import W_SCALE, central_features


def brute(pdf: pd.DataFrame, iters: int = 6):
    out = {}
    for grp, g in pdf.groupby("grp"):
        x = g["x"].to_numpy().astype(object)  # python ints: no int64 overflow ambiguity
        y = g["y"].to_numpy().astype(object)
        n = len(g)
        mean_x, mean_y = int(sum(x)) // n, int(sum(y)) // n
        cx, cy = mean_x, mean_y
        for _ in range(iters):
            d2 = [(int(xi) - cx) ** 2 + (int(yi) - cy) ** 2 for xi, yi in zip(x, y)]
            w = [int(math.floor(W_SCALE / math.sqrt(float(d + 1)))) for d in d2]
            sw = sum(w)
            cx = sum(wi * int(xi) for wi, xi in zip(w, x)) // sw
            cy = sum(wi * int(yi) for wi, yi in zip(w, y)) // sw
        out[grp] = (n, mean_x, mean_y, cx, cy)
    return out


def test_fuzz_exact_replay(spark):
    rng = np.random.default_rng(3)
    n = 300
    pdf = pd.DataFrame(
        {
            "grp": rng.integers(0, 4, n).astype("int64"),
            "x": rng.integers(0, 400_000, n),
            "y": rng.integers(0, 400_000, n),
        }
    )
    got = {
        r["grp"]: (r["n"], r["mean_x"], r["mean_y"], r["med_x"], r["med_y"])
        for r in (
            central_features(spark.createDataFrame(pdf), iters=6)
            .toPandas()
            .to_dict("records")
        )
    }
    assert got == brute(pdf)


def test_median_resists_outlier_mean_does_not(spark):
    """90 points in a tight cluster at (1000, 1000) + 10 outliers at
    (200000, 200000): the mean center is dragged ~20000 units out, the
    geometric median stays inside the cluster."""
    xs = [1000 + (i % 10) for i in range(90)] + [200_000] * 10
    ys = [1000 + (i // 10) for i in range(90)] + [200_000] * 10
    pdf = pd.DataFrame({"grp": [0] * 100, "x": xs, "y": ys})
    r = central_features(spark.createDataFrame(pdf), iters=6).collect()[0]
    assert abs(r["mean_x"] - 1000) > 15_000
    assert abs(r["med_x"] - 1000) < 100
    assert abs(r["med_y"] - 1000) < 100


def test_plan_broadcast_rounds_no_python(spark, sf_dir):
    from versatiles_rs_spark import queries as Q

    df = Q.REGISTRY["central_features"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "PythonUDF" not in plan
    assert "BroadcastHashJoin" in plan  # per-round center table broadcast
    assert "CartesianProduct" not in plan
