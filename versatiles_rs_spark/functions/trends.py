"""Per-cell temporal trend detection — Mann-Kendall over tile-grid bins.

The "emerging hotspot" primitive (the trend half of ArcGIS-style
space-time-cube analysis): bucket a point stream into (tile cell, time
bin) counts and score each cell's activity TREND with the Mann-Kendall
statistic (Mann 1945; Kendall 1975) — the standard nonparametric
monotonic-trend test:

    S     = sum_{i<j} sign(c_j - c_i)        over the T bin counts
    var S = [T(T-1)(2T+5) - sum_t m_t(m_t-1)(2m_t+5)] / 18
            (m_t = tie-group sizes of the count values)
    z     = (S-1)/sqrt(var) if S>0, (S+1)/sqrt(var) if S<0, else 0

|z| > ~1.96 flags a cell whose activity is rising (new/intensifying
hotspot) or falling. Everything distributed is exact integers: bin
assignment is integer floor-division of epoch-micros, counts and S and
the tie term are int64, so the only floats are the final z expression
(identical IEEE evaluation in Spark and DuckDB, rounded to 6 places).

Plan shape: one slim (cell, bin, count) aggregation over the points; one
groupBy cell building the dense T-length count vector (map fill — empty
bins are real zeros in the series); S and the tie term are higher-order
folds over that 8-element array, no explode of the series and no second
pass over the points. The count vector sits behind a single_eval barrier
(lambda-CSE lesson: 28 unrolled sign terms would otherwise each re-inline
the map-fill transform). The time extent (min/max epoch) is one scalar
agg job, replayed as scalar subqueries in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..udfs import single_eval, tile_x_expr, tile_y_expr


def mann_kendall_cells(
    points: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str = "ts",
    zoom: int = 6,
    n_bins: int = 8,
) -> DataFrame:
    """(x, y, total, s, z) per cell occupied in at least one bin; z is the
    tie-corrected Mann-Kendall score of the cell's n_bins count series
    (empty bins count as zero), rounded to 6 places."""
    # events.ts is TIMESTAMP_NTZ (unix_micros rejects it); epoch micros via
    # timestampdiff matches DuckDB's epoch_us (queries._US convention)
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    pts = points.select(
        tile_x_expr(F.col(lon_col), F.lit(zoom)).alias("x"),
        tile_y_expr(F.col(lat_col), F.lit(zoom)).alias("y"),
        us.alias("us"),
    )
    ext = pts.agg(F.min("us").alias("t0"), F.max("us").alias("t1")).collect()[0]
    t0, t1 = ext["t0"], ext["t1"]
    span = (t1 - t0) + 1  # +1 so the max timestamp lands in the last bin

    binned = (
        pts.withColumn(
            "bin", F.expr(f"(us - {t0}) * {n_bins} div {span}").cast("int")
        )
        .groupBy("x", "y", "bin")
        .agg(F.count("*").alias("cnt"))
    )
    series = binned.groupBy("x", "y").agg(
        F.map_from_entries(F.collect_list(F.struct("bin", "cnt"))).alias("mp"),
        F.sum("cnt").alias("total"),
    )
    cs = F.transform(
        F.sequence(F.lit(0), F.lit(n_bins - 1)),
        lambda b: F.coalesce(F.element_at("mp", b), F.lit(0).cast("long")),
    )
    series = series.withColumn("cs", single_eval(cs)).drop("mp")

    def el(i: int):
        return F.element_at("cs", i + 1)

    s = None
    for i in range(n_bins):
        for j in range(i + 1, n_bins):
            term = (el(j) > el(i)).cast("long") - (el(j) < el(i)).cast("long")
            s = term if s is None else s + term
    # tie term over the VALUE multiplicities of the series
    ties = F.expr(
        "aggregate(transform(array_distinct(cs), v -> size(filter(cs, x -> x = v))),"
        " cast(0 as bigint), (a, m) -> a + cast(m as bigint) * (m - 1) * (2 * m + 5))"
    )
    n = n_bins
    var = (F.lit(n * (n - 1) * (2 * n + 5)).cast("long") - ties).cast("double") / F.lit(
        18.0
    )
    out = series.withColumn("s", s.cast("long")).withColumn("_var", var)
    z = (
        F.when(F.col("_var") <= F.lit(0.0), F.lit(0.0))
        .when(F.col("s") > 0, (F.col("s") - F.lit(1.0)) / F.sqrt(F.col("_var")))
        .when(F.col("s") < 0, (F.col("s") + F.lit(1.0)) / F.sqrt(F.col("_var")))
        .otherwise(F.lit(0.0))
    )
    return out.select("x", "y", "total", "s", F.round(z, 6).alias("z"))
