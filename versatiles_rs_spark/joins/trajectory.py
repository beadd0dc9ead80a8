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


def contact_pairs(
    points: DataFrame,
    user_col: str = "user_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str = "ts",
    zoom: int = 4,
    bucket_seconds: int = 86400,
    min_contacts: int = 2,
    cell_cap: int | None = None,
) -> DataFrame:
    """Proximity co-occurrence join: which entities were in the SAME
    place at the SAME time, repeatedly — the contact-tracing / exposure
    primitive (GAEN-style proximity events; also co-worker/companion
    inference in mobility mining).

    Space-time key = (grid cell at `zoom`, timestamp div bucket) — both
    exact int64; DISTINCT (user, cell, bucket) visits feed the inverted
    space-time index (equi-join on the packed key), so a pair's
    n_contacts counts distinct co-present (cell, bucket) slots, not raw
    fix pairs (a chatty device doesn't inflate its contacts).

    100 TB shape mirrors trajectory_similarity: one distinct projection
    of slim longs, one equi-join, one count aggregation; a slot hosting
    k users yields k(k-1)/2 candidate pairs — `cell_cap` drops
    over-crowded slots by broadcast anti-join (a stadium slot pairs
    everyone with everyone and carries no inference signal), and the
    single-long key is AQE-skew-splittable.

    Output: (user_a, user_b, n_contacts, first_bucket, last_bucket),
    user_a < user_b, n_contacts >= min_contacts."""
    key = (
        (
            tile_x_expr(F.col(lon_col), F.lit(zoom)) * F.lit(1 << 21)
            + tile_y_expr(F.col(lat_col), F.lit(zoom))
        ) * F.lit(1 << 21)
        + F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP '1970-01-01 00:00:00', {ts_col})"
            f" div {int(bucket_seconds) * 1_000_000}"
        )
    )
    visits = points.select(
        F.col(user_col).cast("long").alias("u"), key.alias("slot")
    ).distinct()
    if cell_cap is not None:
        hot = (
            visits.groupBy("slot")
            .agg(F.count("*").alias("k"))
            .filter(F.col("k") > F.lit(cell_cap))
            .select("slot")
        )
        visits = visits.join(F.broadcast(hot), on="slot", how="left_anti")
    bucket = F.pmod("slot", F.lit(1 << 21))
    out = (
        visits.select(F.col("u").alias("ua"), "slot")
        .join(visits.select(F.col("u").alias("ub"), "slot"), on="slot")
        .filter(F.col("ua") < F.col("ub"))
        .select("ua", "ub", bucket.alias("bucket"))
        .groupBy("ua", "ub")
        .agg(
            F.count("*").cast("long").alias("n_contacts"),
            F.min("bucket").alias("first_bucket"),
            F.max("bucket").alias("last_bucket"),
        )
        .filter(F.col("n_contacts") >= F.lit(int(min_contacts)))
    )
    return out.select(
        F.col("ua").alias("user_a"), F.col("ub").alias("user_b"),
        "n_contacts", "first_bucket", "last_bucket",
    )
