"""Differential fuzzing: random geo-bbox/zoom filters, Spark engine vs
DuckDB oracle. Catches tile-boundary drift (eps inset, clamping, pole/
antimeridian edges) that fixed golden cases can miss. Deterministic seeds."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark import tile_math as tm
from versatiles_rs_spark.operators.filter import filter_geo_bbox
from versatiles_rs_spark.udfs import (
    derived_lat_expr,
    derived_lon_expr,
    derived_lonlat_sql,
    tile_xy_sql,
    with_tile_columns,
)


@pytest.fixture(scope="module")
def ducks(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con


def random_boxes(n, seed):
    rng = np.random.default_rng(seed)
    boxes = []
    for _ in range(n):
        z = int(rng.integers(1, 12))
        x0 = float(rng.uniform(-185, 175))  # deliberately allow out-of-range west
        y0 = float(rng.uniform(-88, 80))    # and beyond-mercator south
        w = float(rng.uniform(0.01, 90))
        h = float(rng.uniform(0.01, 60))
        boxes.append((z, x0, y0, min(x0 + w, 185.0), min(y0 + h, 88.0)))
    return boxes


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_bbox_filters_match_oracle(spark, sf_dir, ducks, seed):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lon_sql, lat_sql = derived_lonlat_sql("event_id")
    for z, x0, y0, x1, y1 in random_boxes(12, seed):
        # engine side: derived coords -> tile cols -> geo-bbox filter
        df = ev.withColumn("lon", derived_lon_expr(F.col("event_id"))).withColumn(
            "lat", derived_lat_expr(F.col("event_id"))
        )
        df = with_tile_columns(df, "lon", "lat", zoom=z)
        got = filter_geo_bbox(df, (x0, y0, x1, y1), zoom=z).count()
        # oracle side: the same tile bbox computed by tile_math, as SQL ranges
        tx0, ty0, tx1, ty1 = tm.geo_bbox_to_tile_bbox(z, x0, y0, x1, y1)
        xs, ys = tile_xy_sql(lon_sql, lat_sql, z)
        (expect,) = ducks.execute(
            f"SELECT count(*) FROM events WHERE {xs} BETWEEN {tx0} AND {tx1} "
            f"AND {ys} BETWEEN {ty0} AND {ty1}"
        ).fetchone()
        assert got == expect, (z, x0, y0, x1, y1)


@pytest.mark.parametrize("seed", [5, 97])
def test_random_pyramid_counts_match_oracle(spark, sf_dir, ducks, seed):
    """Multi-level pyramid filter counts (OR of per-level tile bboxes)."""
    from versatiles_rs_spark.operators.filter import filter_pyramid

    rng = np.random.default_rng(seed)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lon_sql, lat_sql = derived_lonlat_sql("event_id")
    for _ in range(4):
        z_min = int(rng.integers(1, 5))
        z_max = z_min + int(rng.integers(1, 4))
        x0 = float(rng.uniform(-170, 120))
        y0 = float(rng.uniform(-70, 40))
        box = (x0, y0, x0 + float(rng.uniform(1, 50)), y0 + float(rng.uniform(1, 30)))
        base = ev.withColumn("lon", derived_lon_expr(F.col("event_id"))).withColumn(
            "lat", derived_lat_expr(F.col("event_id"))
        )
        got = 0
        union_sql = []
        for lvl in range(z_min, z_max + 1):
            df = with_tile_columns(base, "lon", "lat", zoom=lvl)
            got += filter_pyramid(df, box, z_min, z_max).filter(F.col("z") == lvl).count()
            tx0, ty0, tx1, ty1 = tm.geo_bbox_to_tile_bbox(lvl, *box)
            xs, ys = tile_xy_sql(lon_sql, lat_sql, lvl)
            union_sql.append(
                f"SELECT count(*) c FROM events WHERE {xs} BETWEEN {tx0} AND {tx1} "
                f"AND {ys} BETWEEN {ty0} AND {ty1}"
            )
        (expect,) = ducks.execute(
            "SELECT sum(c) FROM (" + " UNION ALL ".join(union_sql) + ")"
        ).fetchone()
        assert got == int(expect), (z_min, z_max, box)
