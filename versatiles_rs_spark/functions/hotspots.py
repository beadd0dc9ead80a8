"""Getis-Ord Gi* hotspot detection over the web-mercator tile grid.

The classic local spatial-autocorrelation statistic (Getis & Ord 1992;
Ord & Getis 1995) that GIS suites ship as "hotspot analysis": for each
cell i with binary weights over its 3x3 tile neighborhood,

    Gi* = (S_i - xbar * W_i) / (S * sqrt((n*W_i - W_i^2) / (n - 1)))

where S_i = sum of neighbor-cell values (self included), W_i = number of
in-bounds neighbor cells (8 interior, fewer at the grid edge — no
antimeridian wrap, matching the engine's tile algebra), n = total cells
in the study area (the full 2^z x 2^z zoom grid; empty cells are zeros),
xbar and S the global mean / population std-dev. |Gi*| > ~2 flags a
statistically dense (hot) or sparse (cold) neighborhood.

Determinism / cross-engine contract: cell VALUES here are event COUNTS,
so every aggregate the statistic needs (totals, sum of squares, neighbor
sums, W_i) is exact 64-bit integer arithmetic — no float ever enters a
shuffle, and the final Gi* is one fixed expression over exact integers
(identical IEEE evaluation in Spark and DuckDB), rounded to 6 places for
the hash gate. This is the same trick as tfidf_topk's rational idf: keep
the distributed part integer-exact, spend floats only in a deterministic
scalar epilogue.

100 TB shape: one slim (cell, count) aggregation over the point table;
contributions explode x<=9 on the AGGREGATED cell relation (bounded by
occupied cells, not points); global stats ride a broadcast one-row cross
join. Skewed hot cells are exactly what the statistic is for — they are
single rows after the first aggregation, so no skew mitigation is needed
past it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..udfs import tile_x_expr, tile_y_expr


def cell_counts(
    points: DataFrame, lon_col: str, lat_col: str, zoom: int
) -> DataFrame:
    """(x, y, cnt:long) per occupied cell — the shared point-to-cell
    aggregation every grid statistic starts from (Gi*, Moran/LISA, KDE);
    one definition so cell derivation can never diverge per operator."""
    return (
        points.select(
            tile_x_expr(F.col(lon_col), F.lit(zoom)).alias("x"),
            tile_y_expr(F.col(lat_col), F.lit(zoom)).alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def getis_ord_hotspots(
    points: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    zoom: int = 6,
) -> DataFrame:
    """(x, y, cnt, nbr_sum, wi, gi) for every OCCUPIED cell at `zoom`
    (empty cells enter the statistic as zeros but emit no row). gi is
    rounded to 6 places; sort by gi desc for the hot list."""
    return getis_ord_from_counts(cell_counts(points, lon_col, lat_col, zoom), zoom)


def neighbor_contrib(cells: DataFrame, dim: int, extra_cols: tuple = ()) -> DataFrame:
    """Neighbor contributions: each cell donates its count to the <=9
    in-bounds cells of its 3x3 block, aggregated on the target cell (per
    `extra_cols` slice, e.g. a time bin). Shared by the batch Gi* and the
    space-time emerging analysis — the explode runs on the AGGREGATED
    cell relation, never on points."""
    return (
        cells.select(
            "cnt",
            *extra_cols,
            F.explode(
                F.filter(
                    F.array(
                        *[
                            F.struct(
                                (F.col("x") + F.lit(dx)).alias("tx"),
                                (F.col("y") + F.lit(dy)).alias("ty"),
                            )
                            for dx in (-1, 0, 1)
                            for dy in (-1, 0, 1)
                        ]
                    ),
                    lambda c: (c["tx"] >= 0)
                    & (c["tx"] < dim)
                    & (c["ty"] >= 0)
                    & (c["ty"] < dim),
                )
            ).alias("t"),
        )
        .groupBy(F.col("t.tx").alias("x"), F.col("t.ty").alias("y"), *extra_cols)
        .agg(F.sum("cnt").alias("nbr_sum"))
    )


def wi_col(dim: int):
    """W_i (in-bounds 3x3 neighbor count) from grid position alone."""
    wx = F.lit(3) - (F.col("x") == 0).cast("int") - (F.col("x") == dim - 1).cast("int")
    wy = F.lit(3) - (F.col("y") == 0).cast("int") - (F.col("y") == dim - 1).cast("int")
    return (wx * wy).cast("long")


def gi_expr(n_cells: int):
    """The guarded Gi* float expression over (nbr_sum, tot, tot2, wi)
    columns — ONE definition so the batch query, the streaming read path
    and the space-time series all evaluate byte-identical doubles (the
    cross-engine hash contract depends on this expression's exact shape;
    its SQL twin is queries._gi_sql_expr)."""
    n = F.lit(float(n_cells))
    xbar = F.col("tot") / n
    s2 = F.col("tot2") / n - xbar * xbar
    denom = F.sqrt(s2) * F.sqrt(
        (n * F.col("wi") - F.col("wi") * F.col("wi")) / (n - F.lit(1.0))
    )
    gi = (F.col("nbr_sum") - xbar * F.col("wi")) / denom
    # a zero-variance field (every cell identical) has no hotspots and an
    # undefined z-score — define Gi* = 0 there instead of dividing by zero
    return F.when(s2 > F.lit(0.0), gi).otherwise(F.lit(0.0))


def getis_ord_from_counts(cells: DataFrame, zoom: int = 6) -> DataFrame:
    """Gi* over a pre-aggregated (x, y, cnt) cell relation — the entry
    point when counts already exist (a streaming windowed aggregation, a
    stored rollup table, a snapshot-table change feed) so the statistic
    composes with the engine's incremental layers without re-scanning
    points."""
    dim = 1 << zoom
    cells = cells.select("x", "y", F.col("cnt").cast("long").alias("cnt")).cache()

    # exact global stats of the full zoom grid (empties are zeros):
    # sum x_j = total points, sum x_j^2 = sum over occupied cells
    stats = cells.agg(
        F.sum("cnt").alias("tot"), F.sum(F.col("cnt") * F.col("cnt")).alias("tot2")
    )
    # only occupied targets are kept (inner join) — their neighbor sums
    # are complete because empty cells donate nothing
    out = (
        cells.join(neighbor_contrib(cells, dim), on=["x", "y"])
        .withColumn("wi", wi_col(dim))
        .crossJoin(F.broadcast(stats))
    )
    return out.select(
        "x", "y", "cnt", "nbr_sum", "wi", F.round(gi_expr(dim * dim), 6).alias("gi")
    )
