"""Co-location mining (functions/colocation.py): brute O(n^2) parity on a
planted pattern, participation-index arithmetic, symmetry, plan gate."""

import itertools

import numpy as np
import pandas as pd

from versatiles_rs_spark.functions.colocation import colocation_pairs


def _df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["id", "type", "lon", "lat"])
    return spark.createDataFrame(
        pdf, schema="id long, type string, lon double, lat double"
    )


def _brute(rows, radius_deg):
    r_i7 = int(round(radius_deg * 1e7))
    pts = [
        (i, t, int(np.floor(lon * 1e7)), int(np.floor(lat * 1e7)))
        for i, t, lon, lat in rows
    ]
    types = sorted({t for _, t, _, _ in pts})
    n = {t: sum(1 for p in pts if p[1] == t) for t in types}
    out = {}
    for ta, tb in itertools.combinations(types, 2):
        awb = sum(
            1
            for i, t, x, y in pts
            if t == ta
            and any(
                (x - qx) ** 2 + (y - qy) ** 2 <= r_i7**2
                for _, qt, qx, qy in pts
                if qt == tb
            )
        )
        bwa = sum(
            1
            for i, t, x, y in pts
            if t == tb
            and any(
                (x - qx) ** 2 + (y - qy) ** 2 <= r_i7**2
                for _, qt, qx, qy in pts
                if qt == ta
            )
        )
        if awb or bwa:
            out[(ta, tb)] = (
                n[ta], n[tb], awb, bwa,
                min(awb * 1000 // n[ta], bwa * 1000 // n[tb]),
            )
    return out


def test_colocation_matches_brute(spark):
    rng = np.random.default_rng(9)
    rows = []
    i = 0
    # planted rule: every "atm" sits next to a "store" (PI high)
    for k in range(6):
        rows.append((i, "atm", 10.0 + 3.0 * k, 20.0)); i += 1
        rows.append((i, "store", 10.0 + 3.0 * k + 0.3, 20.0)); i += 1
    # "park" scattered far away (PI ~ 0 against everything)
    for k in range(5):
        rows.append((i, "park", -150.0 + 7.0 * k, -60.0)); i += 1
    # one park near one atm: asymmetric participation
    rows.append((i, "park", 10.4, 20.2)); i += 1
    got = {
        (r.type_a, r.type_b): (r.n_a, r.n_b, r.a_with_b, r.b_with_a, r.pi_milli)
        for r in colocation_pairs(
            _df(spark, rows), id_col="id", type_col="type", radius_deg=1.0
        ).collect()
    }
    want = _brute(rows, 1.0)
    assert got == want
    assert got[("atm", "store")][4] == 1000  # full participation both ways
    # the lone co-located park: 1 of 6 parks, all 6... pi = min side
    a, b = ("atm", "park")
    assert (a, b) in got and got[(a, b)][4] == got[(a, b)][2] * 1000 // 6


def test_colocation_same_type_never_pairs(spark):
    rows = [(0, "x", 0.0, 0.0), (1, "x", 0.1, 0.0), (2, "y", 50.0, 0.0)]
    assert colocation_pairs(_df(spark, rows), id_col="id", type_col="type").count() == 0


def test_colocation_plan_stays_jvm_side(spark):
    rows = [(k, "ab"[k % 2], float(k), 0.0) for k in range(6)]
    df = colocation_pairs(_df(spark, rows), id_col="id", type_col="type")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_cross_k_matches_brute(spark):
    import math

    from versatiles_rs_spark.functions.colocation import cross_k

    rng = np.random.default_rng(17)
    rows = []
    i = 0
    # "a" and "b" interleaved in one corridor (attraction); "c" far away
    for k in range(10):
        rows.append((i, "a", 10.0 + 0.21 * k, 20.0)); i += 1
        rows.append((i, "b", 10.1 + 0.21 * k, 20.0)); i += 1
    for k in range(8):
        rows.append((i, "c", -120.0 + 5.0 * k, -40.0)); i += 1
    radii = (0.25, 0.5, 1.0)
    area = 360.0 * 170.0
    got = {
        (r.type_a, r.type_b, r.r_deg): r
        for r in cross_k(
            _df(spark, rows), id_col="id", type_col="type", radii_deg=radii
        ).collect()
    }
    # brute cross-pair counts on the same quantization
    pts = [(t, int(np.floor(lon * 1e7)), int(np.floor(lat * 1e7))) for _, t, lon, lat in rows]
    n = {t: sum(1 for p in pts if p[0] == t) for t in "abc"}
    for ta, tb in (("a", "b"), ("a", "c"), ("b", "c")):
        for r in radii:
            cnt = sum(
                1
                for t1, x1, y1 in pts if t1 == ta
                for t2, x2, y2 in pts if t2 == tb
                if (x1 - x2) ** 2 + (y1 - y2) ** 2 <= int(r * 1e7) ** 2
            )
            key = (ta, tb, r)
            if cnt == 0 and key not in got:
                continue  # pairs with zero candidates in the join emit no row
            row = got[key]
            assert (row.n_a, row.n_b, row.n_pairs) == (n[ta], n[tb], cnt)
            k_ref = area * cnt / (n[ta] * n[tb])
            assert abs(row.k_ab - k_ref) < 1e-6
            assert abs(row.l_ab - (math.sqrt(k_ref / math.pi) - r)) < 1e-6
    # interleaved corridor: strong attraction at 0.25 deg
    assert got[("a", "b", 0.25)].l_ab > 1.0
    # far-apart types never pair
    assert ("a", "c", 1.0) not in got and ("b", "c", 1.0) not in got


def test_cross_k_plan_no_cartesian(spark):
    from versatiles_rs_spark.functions.colocation import cross_k

    rows = [(k, "ab"[k % 2], float(k), 0.0) for k in range(6)]
    df = cross_k(_df(spark, rows), id_col="id", type_col="type")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
