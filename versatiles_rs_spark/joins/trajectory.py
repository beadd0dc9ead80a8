"""Trajectory co-visitation similarity join (exact set-similarity).

"Which users move alike?" — the mobility twin of document MinHash: each
trajectory reduces to its SET of visited grid cells, similarity is
Jaccard |A∩B| / |A∪B|, and the join returns pairs above a threshold.
Unlike functions/dedup.py's MinHash (a probabilistic estimate for
billion-document corpora), trajectories compress enough (a device visits
100s-1000s of cells, not millions) that the EXACT join is the right
tool: candidates come from the inverted cell index (pairs sharing >= 1
cell — any pair with J > 0 shares one by definition, so candidate
generation loses nothing), and the whole statistic is integer counting.

Threshold test is exact integer cross-multiplication
    inter * 1000 >= j_milli_min * (|A| + |B| - inter)
— no float ever compares (the repo's half-tie rule); the reported
j_milli = (inter * 1000) div union uses non-negative floor division so
Spark `div` == DuckDB `//`.

100 TB shape: one distinct (user, cell) projection (slim longs), one
equi-join on cell (the inverted index), one (ua, ub) count aggregation.
A cell visited by k users contributes k*(k-1)/2 candidate pairs — the
classic inverted-index hot-bucket skew; keys are single longs so AQE
skew-split applies, and `cell_cap` drops cells visited by more users
than the cap via a broadcast anti-join of the (few) over-cap cells
(stations/airports pair everyone with everyone and carry no similarity
signal — same move as functions/dedup.py's bucket cap, same rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..udfs import tile_x_expr, tile_y_expr


def user_cells(
    points: DataFrame,
    user_col: str = "user_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    zoom: int = 6,
) -> DataFrame:
    """Distinct (user, cell) visits — cell packed to one long."""
    return points.select(
        F.col(user_col).cast("long").alias("u"),
        (
            tile_x_expr(F.col(lon_col), F.lit(zoom)) * F.lit(1 << 21)
            + tile_y_expr(F.col(lat_col), F.lit(zoom))
        ).alias("cell"),
    ).distinct()


def trajectory_similarity(
    points: DataFrame,
    user_col: str = "user_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    zoom: int = 6,
    min_inter: int = 3,
    j_milli_min: int = 20,
    cell_cap: int | None = None,
) -> DataFrame:
    """(user_a, user_b, inter, a_cells, b_cells, j_milli) for every user
    pair (user_a < user_b) sharing >= `min_inter` cells with Jaccard >=
    j_milli_min/1000. `cell_cap` (optional) drops cells visited by more
    than that many users before pairing."""
    uc = user_cells(points, user_col, lon_col, lat_col, zoom).cache()
    if cell_cap is not None:
        hot = (
            uc.groupBy("cell")
            .agg(F.count("*").alias("k"))
            .filter(F.col("k") > F.lit(cell_cap))
            .select("cell")
        )
        uc = uc.join(F.broadcast(hot), on="cell", how="left_anti")
    sizes = uc.groupBy("u").agg(F.count("*").cast("long").alias("n"))
    inter = (
        uc.select(F.col("u").alias("ua"), "cell")
        .join(uc.select(F.col("u").alias("ub"), "cell"), on="cell")
        .filter(F.col("ua") < F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.count("*").cast("long").alias("inter"))
        .filter(F.col("inter") >= F.lit(int(min_inter)))
    )
    out = (
        inter.join(sizes.select(F.col("u").alias("ua"), F.col("n").alias("a_cells")), on="ua")
        .join(sizes.select(F.col("u").alias("ub"), F.col("n").alias("b_cells")), on="ub")
        .filter(
            F.col("inter") * F.lit(1000)
            >= F.lit(int(j_milli_min))
            * (F.col("a_cells") + F.col("b_cells") - F.col("inter"))
        )
    )
    return out.select(
        F.col("ua").alias("user_a"),
        F.col("ub").alias("user_b"),
        "inter",
        "a_cells",
        "b_cells",
        F.expr("(inter * 1000) div (a_cells + b_cells - inter)").alias("j_milli"),
    )
