"""Trajectory co-visitation similarity join (joins/trajectory.py): brute
python parity, integer threshold edges, hot-cell cap, slim-plan gate."""

import itertools

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from versatiles_rs_spark.joins.trajectory import trajectory_similarity, user_cells


def _df(spark, visits):
    """visits: list of (user, lon, lat)."""
    pdf = pd.DataFrame(visits, columns=["user_id", "lon", "lat"])
    return spark.createDataFrame(pdf, schema="user_id long, lon double, lat double")


def _cell(lon, lat, zoom=6):
    import math

    dim = 1 << zoom
    x = min(max(int(math.floor(dim * (lon / 360.0 + 0.5))), 0), dim - 1)
    yf = dim * (
        0.5 - 0.5 * math.log(math.tan(lat * math.pi / 360.0 + math.pi / 4.0)) / math.pi
    )
    y = min(max(int(math.floor(yf)), 0), dim - 1)
    return x * (1 << 21) + y


def _brute(visits, min_inter, j_milli_min, zoom=6):
    sets: dict = {}
    for u, lon, lat in visits:
        sets.setdefault(u, set()).add(_cell(lon, lat, zoom))
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter >= min_inter and inter * 1000 >= j_milli_min * union:
            out[(a, b)] = (inter, len(sets[a]), len(sets[b]), inter * 1000 // union)
    return out


def test_trajectory_similarity_matches_brute(spark):
    rng = np.random.default_rng(3)
    visits = []
    # three commuter archetypes sharing corridors + per-user noise
    corridors = {
        0: [(10.0 + 6.0 * k, 45.0) for k in range(8)],
        1: [(10.0 + 6.0 * k, 45.0) for k in range(6)] + [(30.0, 0.0), (37.0, 0.0)],
        2: [(-100.0 + 6.0 * k, -20.0) for k in range(8)],
        3: [(-100.0 + 6.0 * k, -20.0) for k in range(5)],
        4: [(float(rng.uniform(-170, 170)), float(rng.uniform(-75, 75)))
            for _ in range(8)],
    }
    for u, pts in corridors.items():
        visits += [(u, lon, lat) for lon, lat in pts]
    got = {
        (r.user_a, r.user_b): (r.inter, r.a_cells, r.b_cells, r.j_milli)
        for r in trajectory_similarity(
            _df(spark, visits), min_inter=3, j_milli_min=20
        ).collect()
    }
    want = _brute(visits, 3, 20)
    assert got == want
    assert (0, 1) in got and (2, 3) in got  # the two corridor pairs
    assert all((4 not in k) for k in got)   # the random walker pairs with nobody


def test_trajectory_threshold_is_exact_integer(spark):
    # |A| = |B| = 5, inter = 3 -> union = 7, J = 3/7 = 0.4285...
    # j_milli_min = 429 must EXCLUDE (3000 < 429*7 = 3003);
    # j_milli_min = 428 must include (3000 >= 2996)
    visits = []
    for k in range(3):
        visits += [(1, 10.0 + 6.0 * k, 10.0), (2, 10.0 + 6.0 * k, 10.0)]
    visits += [(1, 50.0, 10.0), (1, 58.0, 10.0)]
    visits += [(2, 70.0, 10.0), (2, 78.0, 10.0)]
    df = _df(spark, visits)
    assert trajectory_similarity(df, min_inter=3, j_milli_min=429).count() == 0
    rows = trajectory_similarity(df, min_inter=3, j_milli_min=428).collect()
    assert len(rows) == 1 and rows[0].j_milli == 428  # 3000 div 7


def test_trajectory_cell_cap_drops_hub(spark):
    # every user visits the hub; only 1 and 2 share a private corridor
    visits = [(u, 0.0, 0.0) for u in range(1, 6)]
    for k in range(3):
        visits += [(1, 40.0 + 6.0 * k, 30.0), (2, 40.0 + 6.0 * k, 30.0)]
    df = _df(spark, visits)
    capped = trajectory_similarity(df, min_inter=3, j_milli_min=1, cell_cap=3)
    rows = capped.collect()
    assert {(r.user_a, r.user_b) for r in rows} == {(1, 2)}
    # the hub cell no longer counts toward inter or sizes
    assert rows[0].inter == 3 and rows[0].a_cells == 3 and rows[0].b_cells == 3


def test_trajectory_plan_stays_jvm_side(spark):
    visits = [(u, float(u), 0.0) for u in range(5)]
    df = trajectory_similarity(_df(spark, visits), min_inter=1, j_milli_min=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_user_cells_distinct(spark):
    visits = [(7, 10.0, 10.0)] * 4 + [(7, 20.0, 20.0)]
    assert user_cells(_df(spark, visits)).count() == 2
