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
