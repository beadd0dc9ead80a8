"""Salting: result parity with unsalted plans + actual spread of the hot key."""

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark import fixtures
from versatiles_rs_spark.joins.skew import (
    replicate_with_salts,
    salted_equi_join,
    salted_grouped_agg,
    with_salt,
)
from versatiles_rs_spark.udfs import tile_x_expr, tile_y_expr


@pytest.fixture(scope="module")
def skewed_points(spark):
    """~20% of rows in one hot cell (fixtures' skew contract)."""
    df = fixtures.images_with_tiles_df(spark, 2000, size=16, zoom=6, partitions=4, skew=True)
    return df.select("image_id", "lon", "lat", "x", "y")


def test_hot_cell_exists(skewed_points):
    top = (
        skewed_points.groupBy("x", "y").count().orderBy(F.desc("count")).first()
    )
    assert top["count"] >= 0.15 * 2000  # the planted hot cell


def test_salt_is_deterministic_and_bounded(spark, skewed_points):
    a = with_salt(skewed_points, "image_id", 8).select("image_id", "salt")
    b = with_salt(skewed_points, "image_id", 8).select("image_id", "salt")
    assert a.exceptAll(b).count() == 0
    assert a.agg(F.min("salt"), F.max("salt")).first() == (0, 7)


def test_salted_join_matches_unsalted(spark, skewed_points):
    cells = (
        skewed_points.groupBy("x", "y")
        .count()
        .select("x", "y", F.col("count").alias("cell_weight"))
    )
    plain = skewed_points.join(cells, on=["x", "y"])
    salted = salted_equi_join(
        skewed_points, cells, on=["x", "y"], big_unique_col="image_id", n_salts=8
    )
    assert salted.count() == plain.count()
    assert salted.select("image_id", "cell_weight").exceptAll(
        plain.select("image_id", "cell_weight")
    ).count() == 0


def test_salted_join_spreads_hot_key(spark, skewed_points):
    """After salting, the hot cell's rows hash into n distinct join keys."""
    b = with_salt(skewed_points, "image_id", 8)
    hot = (
        b.groupBy("x", "y").count().orderBy(F.desc("count")).first()
    )
    spread = (
        b.filter((F.col("x") == hot.x) & (F.col("y") == hot.y))
        .select("salt")
        .distinct()
        .count()
    )
    assert spread == 8


def test_salted_grouped_agg_matches(spark, skewed_points):
    plain = skewed_points.groupBy("x", "y").agg(
        F.count("*").alias("n"), F.min("image_id").alias("first_id")
    )
    salted = salted_grouped_agg(
        skewed_points,
        keys=["x", "y"],
        unique_col="image_id",
        partial_aggs=[F.count("*").alias("pn"), F.min("image_id").alias("pf")],
        final_aggs=[F.sum("pn").alias("n"), F.min("pf").alias("first_id")],
        n_salts=8,
    )
    assert salted.exceptAll(plain).count() == 0 and plain.exceptAll(salted).count() == 0
