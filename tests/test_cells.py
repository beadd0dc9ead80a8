"""Hierarchical cell index (H3/S2 role): packing, parent law, k-ring."""

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.cells import (
    HAS_H3,
    cell_parent_expr,
    kring_cells,
    tile_cell_expr,
    with_cell_ids,
)
from versatiles_rs_spark.udfs import tile_x_expr, tile_y_expr


@pytest.fixture(scope="module")
def pts(spark):
    from versatiles_rs_spark.udfs import derived_lat_expr, derived_lon_expr

    return spark.range(0, 500).select(
        F.col("id"),
        derived_lon_expr(F.col("id")).alias("lon"),
        derived_lat_expr(F.col("id")).alias("lat"),
    )


def test_cell_pack_unpack_consistent(spark, pts):
    res = 8
    df = with_cell_ids(pts, res=res).withColumn(
        "x", tile_x_expr(F.col("lon"), F.lit(res))
    ).withColumn("y", tile_y_expr(F.col("lat"), F.lit(res)))
    bad = df.filter(F.col("cell") != F.shiftleft("x", res) + F.col("y")).count()
    assert bad == 0
    rng = df.agg(F.min("cell"), F.max("cell")).first()
    assert 0 <= rng[0] and rng[1] < (1 << (2 * res))


def test_cell_parent_law(spark, pts):
    """parent(cell at res) == cell at res-1 for every point."""
    res = 8
    df = with_cell_ids(pts, res=res, out="cell_hi")
    df = with_cell_ids(df, res=res - 1, out="cell_lo")
    bad = df.filter(cell_parent_expr(F.col("cell_hi"), res) != F.col("cell_lo")).count()
    assert bad == 0


def test_kring_counts_and_membership(spark, pts):
    res, ring = 6, 1
    df = with_cell_ids(pts.limit(50), res=res)
    ringed = kring_cells(df, res=res, ring=ring)
    # each source row yields <= 9 cells (fewer at the top/bottom edge)
    per = ringed.groupBy("id").count().agg(F.min("count"), F.max("count")).first()
    assert per[1] <= (2 * ring + 1) ** 2 and per[0] >= (ring + 1) * (2 * ring + 1)
    # the original cell is always in its own ring
    orig = with_cell_ids(pts.limit(50), res=res).select("id", F.col("cell").alias("c0"))
    joined = ringed.join(orig, on="id").filter(F.col("cell") == F.col("c0"))
    assert joined.select("id").distinct().count() == 50


def test_h3_backend_gated(spark, pts):
    if HAS_H3:
        pytest.skip("h3 installed: gate not applicable")
    with pytest.raises(NotImplementedError, match="h3"):
        with_cell_ids(pts, res=8, use_h3=True)


class TestS2:
    """Real S2 cell ids (s2.py — public s2geometry algorithm)."""

    def test_face_assignment_and_level0_parents(self):
        import numpy as np

        from versatiles_rs_spark.s2 import s2_cell_id, s2_face, s2_level, s2_parent

        lngs = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
        lats = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
        ids = s2_cell_id(lngs, lats)
        assert list(s2_face(ids)) == [0, 1, 2, 3, 4, 5]
        assert (s2_level(ids) == 30).all() and (ids % 2 == 1).all()
        # level-0 parent of each axis point IS the face cell (face<<61 | 1<<60)
        got = [int(np.uint64(p)) for p in s2_parent(ids, 0).astype(np.uint64)]
        assert got == [(f << 61) | (1 << 60) for f in range(6)]

    def test_hierarchy_containment(self):
        import numpy as np

        from versatiles_rs_spark.s2 import s2_cell_id, s2_level, s2_parent

        a = s2_cell_id(np.array([12.30001]), np.array([51.20001]))
        b = s2_cell_id(np.array([12.30002]), np.array([51.20002]))
        c = s2_cell_id(np.array([-100.0]), np.array([-40.0]))
        # ~1e-5 deg apart: same cell at coarse levels, distinct leaves
        assert a[0] != b[0]
        assert s2_parent(a, 15)[0] == s2_parent(b, 15)[0]
        assert s2_parent(a, 0)[0] != s2_parent(c, 0)[0]
        # parent levels decode correctly
        for lvl in (0, 7, 15, 29):
            assert s2_level(s2_parent(a, lvl))[0] == lvl

    def test_spark_cell_column(self, spark):
        import numpy as np
        import pandas as pd

        from versatiles_rs_spark.cells import with_cell_ids
        from versatiles_rs_spark.s2 import s2_cell_id

        pdf = pd.DataFrame({"lon": [12.3, -100.0, 179.9], "lat": [51.2, -40.0, -89.0]})
        df = spark.createDataFrame(pdf)
        got = [r.cell for r in with_cell_ids(df, res=12, kind="s2").collect()]
        want = list(s2_cell_id(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 12))
        assert got == [int(w) for w in want]
