"""Standard deviational ellipse (functions/ellipse.py): numpy
eigendecomposition parity, planted anisotropic direction, degenerate
clouds, the DECIMAL(38,0) <-> HUGEINT double-cast contract, plan gate."""

import math

import numpy as np
import pandas as pd

from versatiles_rs_spark.functions.ellipse import std_dev_ellipse

SCALE = 10_000


def _df(spark, lon, lat, grp=None):
    d = {"lon": lon, "lat": lat}
    schema = "lon double, lat double"
    if grp is not None:
        d["g"] = grp
        schema += ", g string"
    return spark.createDataFrame(pd.DataFrame(d), schema=schema)


def _numpy_sde(lon, lat):
    """Reference replay: quantize, exact integer moments, eigen."""
    qx = np.floor((np.asarray(lon) + 180.0) * SCALE).astype(np.int64)
    qy = np.floor((np.asarray(lat) + 90.0) * SCALE).astype(np.int64)
    n = len(qx)
    sx, sy = int(qx.sum()), int(qy.sum())
    sxx = int((qx.astype(object) * qx).sum())  # python ints: no overflow
    syy = int((qy.astype(object) * qy).sum())
    sxy = int((qx.astype(object) * qy).sum())
    varx = float(n * sxx - sx * sx) / (float(n) * float(n))
    vary = float(n * syy - sy * sy) / (float(n) * float(n))
    cov = float(n * sxy - sx * sy) / (float(n) * float(n))
    disc = math.sqrt((varx - vary) ** 2 + 4.0 * cov * cov)
    lam1 = (varx + vary + disc) / 2.0
    lam2 = max((varx + vary - disc) / 2.0, 0.0)
    if cov == 0.0:
        ex, ey = (1.0, 0.0) if varx >= vary else (0.0, 1.0)
    else:
        norm = math.hypot(cov, lam1 - varx)
        ex, ey = cov / norm, (lam1 - varx) / norm
    return {
        "lon_c": float(sx // n) / SCALE - 180.0,
        "lat_c": float(sy // n) / SCALE - 90.0,
        "sigma1_deg": round(math.sqrt(2.0 * lam1) / SCALE, 6),
        "sigma2_deg": round(math.sqrt(2.0 * lam2) / SCALE, 6),
        "ex": round(ex, 6),
        "ey": round(ey, 6),
    }


def test_sde_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    # anisotropic cloud rotated 30 degrees, centered off-origin
    t = math.radians(30.0)
    u = rng.normal(0, 8.0, 500)
    v = rng.normal(0, 2.0, 500)
    lon = np.clip(25.0 + u * math.cos(t) - v * math.sin(t), -179, 179)
    lat = np.clip(-10.0 + (u * math.sin(t) + v * math.cos(t)) * 0.5, -80, 80)
    row = std_dev_ellipse(_df(spark, lon, lat)).collect()[0]
    ref = _numpy_sde(lon, lat)
    for k, v_ in ref.items():
        assert abs(getattr(row, k) - v_) < 1e-9, (k, getattr(row, k), v_)
    assert row.n_points == 500
    # eigenvector parity vs numpy's own eigh on the float covariance
    C = np.array(
        [
            [
                ((np.floor((lon + 180) * SCALE) - np.floor((lon + 180) * SCALE).mean()) ** 2).mean(),
                (
                    (np.floor((lon + 180) * SCALE) - np.floor((lon + 180) * SCALE).mean())
                    * (np.floor((lat + 90) * SCALE) - np.floor((lat + 90) * SCALE).mean())
                ).mean(),
            ],
            [0.0, ((np.floor((lat + 90) * SCALE) - np.floor((lat + 90) * SCALE).mean()) ** 2).mean()],
        ]
    )
    C[1, 0] = C[0, 1]
    w, V = np.linalg.eigh(C)
    vec = V[:, np.argmax(w)]
    if vec[1] < 0:
        vec = -vec
    assert abs(abs(row.ex) - abs(vec[0])) < 1e-4
    assert abs(row.ey - vec[1]) < 1e-4
    assert math.sqrt(2 * w.max()) / SCALE == __import__("pytest").approx(
        row.sigma1_deg, rel=1e-4
    )


def test_sde_planted_direction_and_groups(spark):
    # E-W corridor for type a (sigma1 along lon: ex ~ +-1, ey ~ 0);
    # N-S corridor for type b (ex ~ 0, ey ~ 1)
    rng = np.random.default_rng(11)
    lon_a = rng.uniform(-60, 60, 400)
    lat_a = rng.normal(10, 0.5, 400)
    lon_b = rng.normal(-40, 0.5, 300)
    lat_b = rng.uniform(-50, 50, 300)
    df = _df(
        spark,
        np.concatenate([lon_a, lon_b]),
        np.concatenate([lat_a, np.clip(lat_b, -80, 80)]),
        ["a"] * 400 + ["b"] * 300,
    )
    rows = {r.g: r for r in std_dev_ellipse(df, group_col="g").collect()}
    a, b = rows["a"], rows["b"]
    assert a.n_points == 400 and b.n_points == 300
    assert abs(a.ex) > 0.99 and abs(a.ey) < 0.1  # E-W major axis
    assert abs(b.ey) > 0.99 and abs(b.ex) < 0.1  # N-S major axis
    assert a.sigma1_deg > 10 * a.sigma2_deg
    assert abs(a.lon_c) < 5 and abs(a.lat_c - 10) < 0.5
    assert abs(b.lon_c + 40) < 0.5


def test_sde_degenerate_clouds(spark):
    # single point: zero ellipse, axis-aligned convention
    r = std_dev_ellipse(_df(spark, [12.3456], [-45.0])).collect()[0]
    assert r.sigma1_deg == 0.0 and r.sigma2_deg == 0.0
    assert (r.ex, r.ey) == (1.0, 0.0)
    assert abs(r.lon_c - 12.3456) < 1e-4 and abs(r.lat_c + 45.0) < 1e-4
    # perfectly collinear 45-degree line: sigma2 == 0, ex == ey
    xs = np.arange(10, dtype=np.float64)
    r = std_dev_ellipse(_df(spark, xs, xs * 0.5)).collect()[0]
    assert r.sigma2_deg == 0.0 and r.sigma1_deg > 0
    # slope 0.5 in quantized units -> direction (2, 1)/sqrt(5)
    assert abs(r.ex - 2 / math.sqrt(5)) < 1e-6
    assert abs(r.ey - 1 / math.sqrt(5)) < 1e-6


def test_decimal_hugeint_double_cast_parity(spark):
    """The contract the oracle rests on: Spark DECIMAL(38,0)->DOUBLE ==
    DuckDB HUGEINT->DOUBLE bit-for-bit (both correctly rounded)."""
    import duckdb

    vals = [
        "3240000000000000000123",
        "-9999999999999999999999999999",
        "12345678901234567890123456789",
        "18446744073709551617",
        "32399999999999999999987654321",
    ]
    con = duckdb.connect()
    for v in vals:
        d = con.execute(f"select cast(cast('{v}' as hugeint) as double)").fetchone()[0]
        s = spark.sql(f"select cast(cast('{v}' as decimal(38,0)) as double) v").collect()[0].v
        assert d.hex() == s.hex(), (v, d.hex(), s.hex())


def test_sde_plan_stays_jvm_side(spark):
    df = _df(spark, [1.0, 2.0], [3.0, 4.0])
    plan = std_dev_ellipse(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # one partial+final aggregate pair, no extra exchange
    assert plan.count("Exchange") <= 1
