"""Polygon scalar metrics (functions/geometry.py): analytic values,
orientation/translation invariance, degenerate rings, pure-JVM plan."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.geometry import (
    area_expr,
    centroid_exprs,
    perimeter_expr,
    signed_area_expr,
)


def _rings(spark, rows):
    pdf = pd.DataFrame(rows, columns=["id", "x", "y"])
    return spark.createDataFrame(pdf, schema="id long, x array<double>, y array<double>")


def _metrics(df):
    cx, cy = centroid_exprs(F.col("x"), F.col("y"))
    return {
        r.id: r
        for r in df.select(
            "id",
            area_expr(F.col("x"), F.col("y")).alias("area"),
            signed_area_expr(F.col("x"), F.col("y")).alias("sarea"),
            perimeter_expr(F.col("x"), F.col("y")).alias("perim"),
            cx.alias("cx"),
            cy.alias("cy"),
        ).collect()
    }


def test_analytic_polygons(spark):
    sq = ([0.0, 2.0, 2.0, 0.0], [0.0, 0.0, 2.0, 2.0])  # ccw unit-ish square
    tri = ([10.0, 14.0, 10.0], [5.0, 5.0, 8.0])
    hexx = (
        [math.cos(k * math.pi / 3) for k in range(6)],
        [math.sin(k * math.pi / 3) for k in range(6)],
    )
    m = _metrics(_rings(spark, [(0, *sq), (1, *tri), (2, *hexx)]))
    assert m[0].area == pytest.approx(4.0) and m[0].perim == pytest.approx(8.0)
    assert (m[0].cx, m[0].cy) == (pytest.approx(1.0), pytest.approx(1.0))
    assert m[1].area == pytest.approx(6.0)  # 4*3/2
    assert m[1].perim == pytest.approx(4 + 3 + 5.0)
    assert (m[1].cx, m[1].cy) == (pytest.approx(34 / 3), pytest.approx(6.0))
    assert m[2].area == pytest.approx(3 * math.sqrt(3) / 2)  # unit hexagon
    assert m[2].perim == pytest.approx(6.0)
    assert (m[2].cx, m[2].cy) == (pytest.approx(0.0, abs=1e-12), pytest.approx(0.0, abs=1e-12))


def test_orientation_and_concavity(spark):
    ccw = ([0.0, 2.0, 2.0, 0.0], [0.0, 0.0, 2.0, 2.0])
    cw = ([0.0, 0.0, 2.0, 2.0], [0.0, 2.0, 2.0, 0.0])
    # L-shape (concave): area 3, centroid off the vertex mean
    ell = ([0.0, 2.0, 2.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0, 2.0, 2.0])
    m = _metrics(_rings(spark, [(0, *ccw), (1, *cw), (2, *ell)]))
    assert m[0].sarea == pytest.approx(4.0) and m[1].sarea == pytest.approx(-4.0)
    assert m[1].area == pytest.approx(4.0)  # orientation-invariant magnitude
    assert (m[1].cx, m[1].cy) == (pytest.approx(1.0), pytest.approx(1.0))
    assert m[2].area == pytest.approx(3.0)
    # decomposition: rect [0,2]x[0,1] (A=2, c=(1,.5)) + square [0,1]x[1,2]
    # (A=1, c=(.5,1.5)) -> (2*1 + 1*.5)/3 = (2*.5 + 1*1.5)/3 = 2.5/3
    assert (m[2].cx, m[2].cy) == (pytest.approx(2.5 / 3), pytest.approx(2.5 / 3))


def test_poly_metrics_plan_pure_jvm(spark, sf_dir):
    from versatiles_rs_spark.queries import REGISTRY

    df = REGISTRY["poly_metrics"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan  # scan -> project only


def test_point_in_ring_expr_matches_numpy_kernel(spark):
    """The JVM crossing-number expression agrees with joins/pip.py's
    vectorized numpy ray-cast on random points, incl. a concave ring."""
    import numpy as np

    from versatiles_rs_spark.functions.geometry import point_in_ring_expr
    from versatiles_rs_spark.joins.pip import points_in_polygon

    rng = np.random.default_rng(41)
    ring = np.array(
        [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (2.0, 1.5), (0.0, 4.0)]  # concave
    )
    px, py = rng.uniform(-1, 5, 300), rng.uniform(-1, 5, 300)
    # pip.py's kernel takes EXPLICITLY closed rings; the expr closes implicitly
    want = points_in_polygon(px, py, np.vstack([ring, ring[:1]]))
    pdf = pd.DataFrame({"i": range(300), "x": px, "y": py})
    df = spark.createDataFrame(pdf, schema="i long, x double, y double")
    got = df.select(
        "i",
        point_in_ring_expr(
            F.col("x"), F.col("y"), list(ring[:, 0]), list(ring[:, 1])
        ).alias("inside"),
    ).collect()
    assert all(r.inside == bool(want[r.i]) for r in got)


def test_fence_dwell_plan_single_shuffle_no_python(spark, sf_dir):
    from versatiles_rs_spark.queries import REGISTRY

    df = REGISTRY["fence_dwell"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the per-user window
