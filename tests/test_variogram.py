"""Empirical semivariogram (functions/variogram.py): brute-force parity.

The engine bins density-bounded cell-join pairs; the reference here is a
numpy O(n^2) loop over ALL pairs — every pair within max_lag must be
found exactly once, land in the right (no-sqrt) bin, and contribute the
exact squared value difference."""

import numpy as np
import pandas as pd

from versatiles_rs_spark.functions.variogram import SCALE, empirical_variogram


def brute(pdf: pd.DataFrame, max_lag_deg: float, n_bins: int):
    lag = int(round(max_lag_deg * SCALE))
    w = lag // n_bins
    sx = np.floor(pdf["lon"].to_numpy() * 1e7).astype(np.int64) + 180 * SCALE
    sy = np.floor(pdf["lat"].to_numpy() * 1e7).astype(np.int64) + 90 * SCALE
    v = pdf["v"].to_numpy().astype(np.int64)
    out = {}
    n = len(pdf)
    for i in range(n):
        for j in range(i + 1, n):
            d2 = int(sx[i] - sx[j]) ** 2 + int(sy[i] - sy[j]) ** 2
            if d2 > lag * lag:
                continue
            b = sum(1 for t in range(n_bins - 1) if d2 > (w * (t + 1)) ** 2)
            np_, sq = out.get(b, (0, 0))
            out[b] = (np_ + 1, sq + int(v[i] - v[j]) ** 2)
    return {
        b: (np_, sq, sq * 500 // np_) for b, (np_, sq) in out.items()
    }


def test_random_fuzz_parity(spark):
    rng = np.random.default_rng(11)
    n = 400
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            "lon": rng.uniform(-2.0, 2.0, n),
            "lat": rng.uniform(-2.0, 2.0, n),
            "v": rng.integers(-500, 500, n),
        }
    )
    got = (
        empirical_variogram(
            spark.createDataFrame(pdf), max_lag_deg=1.0, n_bins=8,
            value_col="v",
        )
        .toPandas()
        .set_index("lag_bin")
        .sort_index()
    )
    want = brute(pdf, 1.0, 8)
    assert set(got.index) == set(want)
    for b, (np_, sq, gm) in want.items():
        row = got.loc[b]
        assert (row["n_pairs"], row["sum_sq"], row["gamma_milli"]) == (np_, sq, gm), b


def test_bin_edges_and_nugget(spark):
    """A pair at EXACTLY the bin-1 threshold stays in bin 0 (bins are
    (b*w, (b+1)*w]); coincident points land in bin 0 with their squared
    difference (nugget evidence)."""
    w_deg = 1.0 / 8
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            # pair (1,2): dx exactly one bin width; pair (3,4): coincident
            "lon": [0.0, w_deg, 10.0, 10.0],
            "lat": [0.0, 0.0, 10.0, 10.0],
            "v": [100, 60, 7, 4],
        }
    )
    got = (
        empirical_variogram(
            spark.createDataFrame(pdf), max_lag_deg=1.0, n_bins=8, value_col="v"
        )
        .toPandas()
        .set_index("lag_bin")
    )
    assert set(got.index) == {0}
    assert got.loc[0, "n_pairs"] == 2
    assert got.loc[0, "sum_sq"] == 40 * 40 + 3 * 3
