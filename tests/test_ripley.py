"""Ripley's K (functions/ripley.py): O(n^2) numpy reference parity on a
planted-cluster pattern, CSR sanity direction, exact pair-count identity,
and the no-Python plan gate."""

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.ripley import SCALE, ripley_k

RADII = (0.25, 0.5, 1.0)
AREA = 360.0 * 170.0


def _pts(seed=11, n=600, clustered=True):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-179, 179, n)
    lat = rng.uniform(-80, 80, n)
    if clustered:
        k = n // 3
        lon[:k] = np.clip(rng.normal(12.0, 0.4, k), -179, 179)
        lat[:k] = np.clip(rng.normal(33.0, 0.4, k), -80, 80)
    return lon, lat


def _brute(lon, lat):
    """Exact int64 micro7 pair counts per radius — the same quantization
    as the engine, O(n^2) over all pairs (no cell shortcut)."""
    sx = np.floor(lon * 1e7).astype(np.int64)
    sy = np.floor(lat * 1e7).astype(np.int64)
    # clamp |delta| before squaring (far pairs would overflow int64 and
    # wrap into the pass range — same hazard the engine clamps against)
    adx = np.minimum(np.abs(sx[:, None] - sx[None, :]), 2 * 10**9)
    ady = np.minimum(np.abs(sy[:, None] - sy[None, :]), 2 * 10**9)
    d2 = adx * adx + ady * ady
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    return [int((d2 <= (int(r * SCALE)) ** 2).sum()) for r in RADII]


def _df(spark, lon, lat):
    pdf = pd.DataFrame(
        {"id": np.arange(len(lon)), "lon": lon, "lat": lat}
    )
    return spark.createDataFrame(pdf, schema="id long, lon double, lat double")


def test_ripley_matches_brute_pair_counts(spark):
    lon, lat = _pts()
    rows = {r.r_deg: r for r in ripley_k(_df(spark, lon, lat), radii_deg=RADII).collect()}
    brute = _brute(lon, lat)
    assert sorted(rows) == sorted(RADII)
    for i, r in enumerate(RADII):
        row = rows[r]
        assert row.n == len(lon)
        assert row.n_pairs == brute[i]
        k_ref = AREA * brute[i] / (len(lon) * (len(lon) - 1))
        assert abs(row.k - k_ref) < 1e-6
        assert abs(row.l - (math.sqrt(k_ref / math.pi) - r)) < 1e-6
    # planted cluster: L decisively positive at the cluster scale
    assert rows[0.5].l > 0.1


def test_ripley_csr_is_near_zero_l(spark):
    # uniform points in a 20x20 deg window (area passed to the estimator):
    # dense enough that every radius has an expected count in the hundreds
    rng = np.random.default_rng(5)
    lon = rng.uniform(-10, 10, 800)
    lat = rng.uniform(30, 50, 800)
    rows = ripley_k(
        _df(spark, lon, lat), radii_deg=RADII, area_deg2=400.0
    ).collect()
    for row in rows:
        assert row.n_pairs > 50
        # uniform pattern: |L| small relative to the radius (sampling noise
        # + the uncorrected edge bias both shrink L slightly below 0)
        assert abs(row.l) < 0.2 * row.r_deg


def test_ripley_duplicate_locations_pair_up(spark):
    lon = np.array([10.0, 10.0, -40.0])
    lat = np.array([20.0, 20.0, 7.0])
    rows = {r.r_deg: r for r in ripley_k(_df(spark, lon, lat), radii_deg=RADII).collect()}
    for r in RADII:
        assert rows[r].n_pairs == 2  # the coincident pair, both directions


def test_ripley_plan_stays_jvm_side(spark):
    lon, lat = _pts(n=40)
    df = ripley_k(_df(spark, lon, lat), radii_deg=RADII)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_quadrat_parity_and_directions(spark):
    from versatiles_rs_spark.functions.ripley import quadrat_test

    zoom, dim = 3, 8
    m = dim * dim

    def cells_to_lonlat(cells):
        # place a point at each cell center (web-mercator inverse)
        out = []
        for x, y, k in cells:
            lon = (x + 0.5) / dim * 360.0 - 180.0
            yf = (y + 0.5) / dim
            lat = math.degrees(2.0 * (math.atan(math.exp((0.5 - yf) * 2 * math.pi)) - math.pi / 4.0))
            out += [(lon, lat)] * k
        return out

    regular = cells_to_lonlat([(x, y, 1) for x in range(dim) for y in range(dim)])
    clumped = cells_to_lonlat([(3, 3, 60), (4, 4, 4)])
    rows = {
        r.field: r
        for r in quadrat_test(
            {
                "regular": (_df_lonlat(spark, regular), "lon", "lat"),
                "clumped": (_df_lonlat(spark, clumped), "lon", "lat"),
            },
            zoom=zoom,
        ).collect()
    }
    reg = rows["regular"]
    assert (reg.m, reg.tot, reg.tot2, reg.occupied) == (m, m, m, m)
    assert reg.vmr == 0.0  # one point per cell: zero variance
    assert reg.z < -2.0    # significantly MORE regular than CSR
    cl = rows["clumped"]
    assert cl.occupied == 2 and cl.vmr > 10.0 and cl.z > 2.0
    # numpy replay of the exact formula
    import numpy as np

    counts = np.zeros(m)
    counts[0], counts[1] = 60, 4
    chi2 = ((counts - counts.mean()) ** 2).sum() / counts.mean()
    assert abs(cl.vmr - chi2 / (m - 1)) < 1e-6


def _df_lonlat(spark, pts):
    pdf = pd.DataFrame(pts, columns=["lon", "lat"])
    return spark.createDataFrame(pdf, schema="lon double, lat double")


def test_g_function_matches_brute(spark):
    from versatiles_rs_spark.functions.ripley import g_function

    lon, lat = _pts(seed=21, n=500)
    rows = {r.r_deg: r for r in g_function(
        _df(spark, lon, lat), radii_deg=RADII
    ).collect()}
    sx = np.floor(lon * 1e7).astype(np.int64)
    sy = np.floor(lat * 1e7).astype(np.int64)
    adx = np.minimum(np.abs(sx[:, None] - sx[None, :]), 2 * 10**9)
    ady = np.minimum(np.abs(sy[:, None] - sy[None, :]), 2 * 10**9)
    d2 = adx * adx + ady * ady
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    mind = d2.min(axis=1)
    gs = []
    for r in RADII:
        nw = int((mind <= int(r * 1e7) ** 2).sum())
        row = rows[r]
        assert row.n == len(lon) and row.n_with_nbr == nw
        assert abs(row.g - nw / len(lon)) < 1e-6
        gs.append(row.g)
    assert gs == sorted(gs)            # G is a CDF: monotone in r
    # planted cluster pushes G above the CSR curve at the cluster scale
    assert rows[0.5].g > rows[0.5].g_csr


def test_g_function_isolated_points_uncounted(spark):
    from versatiles_rs_spark.functions.ripley import g_function

    lon = np.array([0.0, 0.1, 90.0])   # pair + one isolated point
    lat = np.array([0.0, 0.0, 45.0])
    rows = {r.r_deg: r for r in g_function(
        _df(spark, lon, lat), radii_deg=RADII
    ).collect()}
    for r in RADII:
        assert rows[r].n_with_nbr == 2  # only the close pair counts
