"""Mann-Kendall emerging-hotspot trends (functions/trends.py): python
reference parity, planted trend directions, tie handling, plan gates."""

import datetime
import math

from pyspark.sql import functions as F

from versatiles_rs_spark.functions.trends import mann_kendall_cells

EPOCH = datetime.datetime(2024, 1, 1)


def _mk_reference(counts):
    """Tie-corrected Mann-Kendall (S, z) of one count series."""
    t = len(counts)
    s = sum(
        int(counts[j] > counts[i]) - int(counts[j] < counts[i])
        for i in range(t)
        for j in range(i + 1, t)
    )
    ties = sum(
        m * (m - 1) * (2 * m + 5) for m in (counts.count(v) for v in set(counts))
    )
    var = (t * (t - 1) * (2 * t + 5) - ties) / 18.0
    if var <= 0:
        return s, 0.0
    if s > 0:
        z = (s - 1.0) / math.sqrt(var)
    elif s < 0:
        z = (s + 1.0) / math.sqrt(var)
    else:
        z = 0.0
    return s, round(z, 6)


def _df_from_series(spark, series_by_loc, n_bins=8):
    """One point per count unit; bin b maps to day b (span = n_bins days)."""
    rows = []
    for (lon, lat), counts in series_by_loc.items():
        for b, c in enumerate(counts):
            for k in range(c):
                ts = EPOCH + datetime.timedelta(days=b, seconds=k + 1)
                rows.append((float(lon), float(lat), ts))
    # pin the extent so bin b == day b exactly
    rows.append((170.0, -80.0, EPOCH))
    rows.append((170.0, -80.0, EPOCH + datetime.timedelta(days=n_bins) - datetime.timedelta(seconds=1)))
    return spark.createDataFrame(rows, "lon double, lat double, ts timestamp_ntz")


SERIES = {
    (10.0, 10.0): [0, 1, 2, 3, 4, 5, 6, 7],      # strictly rising
    (-50.0, 20.0): [9, 8, 7, 5, 4, 3, 2, 1],     # strictly falling
    (60.0, -30.0): [3, 3, 3, 3, 3, 3, 3, 3],     # all ties -> z = 0
    (-120.0, 45.0): [2, 5, 1, 7, 2, 5, 1, 6],    # mixed with ties
}


def test_reference_parity_and_direction(spark):
    df = _df_from_series(spark, SERIES)
    got = {
        (r["x"], r["y"]): (r["total"], r["s"], r["z"])
        for r in mann_kendall_cells(df, zoom=6, n_bins=8).collect()
    }
    for (lon, lat), counts in SERIES.items():
        # bind the assertion to the exact cell of the planted lon/lat
        # (engine tile math), so a coordinate swap or bin-to-cell drift
        # can't pass by matching some other cell's scores
        cell = (
            df.sparkSession.range(1)
            .selectExpr(
                f"cast(floor(64 * ({lon} / 360.0 + 0.5)) as bigint) as x",
                "cast(floor(64 * (0.5 - 0.5 * ln(tan("
                f"{lat} * pi() / 360.0 + pi() / 4.0)) / pi())) as bigint) as y",
            )
            .collect()[0]
        )
        key = (cell["x"], cell["y"])
        assert key in got, (lon, lat, key)
        total, s, z = got[key]
        assert total == sum(counts), key
        assert (s, z) == _mk_reference(counts), (key, counts)
    rising = _mk_reference(SERIES[(10.0, 10.0)])
    falling = _mk_reference(SERIES[(-50.0, 20.0)])
    flat = _mk_reference(SERIES[(60.0, -30.0)])
    assert rising[1] > 2.0 and falling[1] < -2.0 and flat == (0, 0.0)


def test_empty_bins_are_zeros(spark):
    # a cell active only in the last two bins: series [0]*6 + [4, 9]
    df = _df_from_series(spark, {(0.5, 0.5): [0, 0, 0, 0, 0, 0, 4, 9]})
    rows = [
        r
        for r in mann_kendall_cells(df, zoom=6, n_bins=8).collect()
        if r["total"] == 13
    ]
    assert len(rows) == 1
    s, z = _mk_reference([0, 0, 0, 0, 0, 0, 4, 9])
    assert rows[0]["s"] == s and rows[0]["z"] == z and z > 0


def test_plan_gates(spark):
    df = _df_from_series(spark, {(1.0, 1.0): [1, 0, 2, 0, 3, 0, 4, 0]})
    plan = (
        mann_kendall_cells(df, zoom=4, n_bins=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # the series fold happens per cell — the 8-bin vector never explodes
    assert plan.count("Generate") <= 1  # only the single_eval barrier


def test_emerging_gi_reference_parity(spark):
    """Composition check: per-bin Gi* surfaces + MK on the Gi* series vs a
    dense numpy replay, with a planted intensifying hotspot."""
    import numpy as np

    from versatiles_rs_spark.functions.trends import emerging_gi_cells

    zoom, n_bins, dim = 4, 8, 16
    rng = np.random.RandomState(3)
    series_by_loc = {}
    # background cells with flat-ish noise
    for k in range(12):
        lon, lat = float(rng.uniform(-160, 160)), float(rng.uniform(-70, 70))
        series_by_loc[(lon, lat)] = list(rng.randint(0, 3, n_bins))
    # a hotspot that ramps up hard
    series_by_loc[(40.0, 40.0)] = [0, 0, 1, 2, 4, 8, 16, 32]
    df = _df_from_series(spark, series_by_loc, n_bins=n_bins)
    got = {
        (r["x"], r["y"]): (r["total"], r["gi_last"], r["mk_s"], r["mk_z"])
        for r in emerging_gi_cells(df, zoom=zoom, n_bins=n_bins).collect()
    }

    # numpy replay over the dense cube (pins counts AND the float pipeline)
    pdf = df.toPandas()
    xs = np.clip(np.floor(dim * (pdf["lon"] / 360.0 + 0.5)), 0, dim - 1).astype(int)
    lat = pdf["lat"].to_numpy()
    yf = dim * (0.5 - 0.5 * np.log(np.tan(lat * np.pi / 360.0 + np.pi / 4.0)) / np.pi)
    ys = np.clip(np.floor(yf), 0, dim - 1).astype(int)
    us = pdf["ts"].values.astype("datetime64[us]").astype("int64")
    t0, span = us.min(), us.max() - us.min() + 1
    bins = (us - t0) * n_bins // span
    cube = np.zeros((dim, dim, n_bins), dtype=np.int64)
    np.add.at(cube, (xs, ys, bins), 1)
    n = float(dim * dim)
    for (x, y), (total, gi_last, mk_s, mk_z) in got.items():
        assert total == int(cube[x, y].sum())
        gis = []
        for b in range(n_bins):
            g = cube[:, :, b]
            tot, tot2 = g.sum(), (g.astype(float) ** 2).sum()
            xbar, s2 = tot / n, (g.astype(float) ** 2).sum() / n - (tot / n) ** 2
            x0, x1 = max(0, x - 1), min(dim - 1, x + 1)
            y0, y1 = max(0, y - 1), min(dim - 1, y + 1)
            wi = (x1 - x0 + 1) * (y1 - y0 + 1)
            nbr = g[x0 : x1 + 1, y0 : y1 + 1].sum()
            if s2 <= 0:
                gis.append(0.0)
            else:
                gis.append(
                    (nbr - xbar * wi)
                    / (math.sqrt(s2) * math.sqrt((n * wi - wi * wi) / (n - 1.0)))
                )
        s_ref, z_ref = _mk_reference(gis)
        assert mk_s == s_ref, (x, y)
        assert abs(mk_z - z_ref) <= 1e-6, (x, y)
        assert abs(gi_last - round(gis[-1], 6)) <= 1e-6
    # the planted ramp is flagged as a strongly emerging hotspot
    ramp = [v for v in got.values() if v[0] == 63]
    assert ramp and ramp[0][3] > 2.5


def test_empty_input_returns_empty(spark):
    from versatiles_rs_spark.functions.trends import emerging_gi_cells, mann_kendall_cells

    empty = spark.createDataFrame([], "lon double, lat double, ts timestamp_ntz")
    assert mann_kendall_cells(empty).count() == 0
    assert emerging_gi_cells(empty).count() == 0
