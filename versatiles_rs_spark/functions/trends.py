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
    if ext["t0"] is None:  # empty input: no cells, not a None-arithmetic crash
        return pts.sparkSession.createDataFrame(
            [], "x long, y long, total bigint, s bigint, z double"
        )
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
    out = _mk_scored(series, n_bins)
    return out.select("x", "y", "total", "s", F.round(F.col("_z"), 6).alias("z"))


def _mk_scored(series: DataFrame, n_bins: int) -> DataFrame:
    """Append `s` (Mann-Kendall S, int64) and `_z` (unrounded tie-corrected
    score) to a frame carrying a `cs` array column of n_bins values. Works
    for integer and float series alike: S is sign comparisons either way,
    and the tie fold counts exact value equality (float series here are
    bit-identical deterministic expressions, so ties are well-defined)."""

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
    return out.withColumn("_z", z)


def emerging_gi_cells(
    points: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str = "ts",
    zoom: int = 6,
    n_bins: int = 8,
) -> DataFrame:
    """Full emerging-hotspot analysis (the ArcGIS space-time-cube recipe):
    per time bin, a Getis-Ord Gi* surface of the (cell, bin) counts
    against that bin's full-grid statistics; then the Mann-Kendall trend
    of each occupied cell's n_bins-long Gi* SERIES. A cell that is not
    merely busy but whose *neighborhood z-score keeps climbing* is an
    emerging hotspot (mk_z > 0 strong), a fading one has mk_z < 0.

    Output: (x, y, total, gi_last, mk_s, mk_z) — gi_last is the final
    bin's Gi* (current heat), mk_s/mk_z the trend over the series.

    Determinism: counts, neighbor sums, per-bin totals and sums of squares
    are exact int64; each gi value is one fixed float expression over
    those integers (identical IEEE in both engines), so the float SERIES
    is bit-identical cross-engine and the MK sign/tie arithmetic on it is
    exact. gi values enter the series unrounded; only the two output
    scores are rounded (6 places).

    Plan shape: one (cell,bin,count) shuffle; neighbor contributions
    explode <=9x on that AGGREGATED relation; per-bin global stats are an
    n_bins-row broadcast; the dense (occupied cell x n_bins) grid comes
    from one sequence explode; one final per-cell fold. The point table
    is scanned once."""
    dim = 1 << zoom
    n_cells = dim * dim
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    pts = points.select(
        tile_x_expr(F.col(lon_col), F.lit(zoom)).alias("x"),
        tile_y_expr(F.col(lat_col), F.lit(zoom)).alias("y"),
        us.alias("us"),
    )
    ext = pts.agg(F.min("us").alias("t0"), F.max("us").alias("t1")).collect()[0]
    if ext["t0"] is None:  # empty input: no cells, not a None-arithmetic crash
        return pts.sparkSession.createDataFrame(
            [],
            "x long, y long, total bigint, gi_last double, mk_s bigint, mk_z double",
        )
    t0, span = ext["t0"], (ext["t1"] - ext["t0"]) + 1

    binned = (
        pts.withColumn("bin", F.expr(f"(us - {t0}) * {n_bins} div {span}").cast("int"))
        .groupBy("x", "y", "bin")
        .agg(F.count("*").alias("cnt"))
        .cache()
    )
    from .hotspots import gi_expr, neighbor_contrib, wi_col

    stats = binned.groupBy("bin").agg(
        F.sum("cnt").alias("tot"), F.sum(F.col("cnt") * F.col("cnt")).alias("tot2")
    )
    contrib = neighbor_contrib(binned, dim, extra_cols=("bin",))
    occupied = binned.groupBy("x", "y").agg(F.sum("cnt").alias("total"))
    dense = (
        occupied.select(
            "x",
            "y",
            "total",
            F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
        )
        .join(contrib, on=["x", "y", "bin"], how="left")
        .withColumn("nbr_sum", F.coalesce("nbr_sum", F.lit(0).cast("long")))
        .join(F.broadcast(stats), on="bin", how="left")
        .withColumn("tot", F.coalesce("tot", F.lit(0).cast("long")))
        .withColumn("tot2", F.coalesce("tot2", F.lit(0).cast("long")))
        .withColumn("wi", wi_col(dim))
    )
    per_bin = dense.select(
        "x", "y", "total", "bin", gi_expr(n_cells).alias("gi")
    )

    series = per_bin.groupBy("x", "y", "total").agg(
        F.map_from_entries(F.collect_list(F.struct("bin", "gi"))).alias("mp")
    )
    cs = F.transform(
        F.sequence(F.lit(0), F.lit(n_bins - 1)),
        lambda b: F.element_at("mp", b),
    )
    series = series.withColumn("cs", single_eval(cs)).drop("mp")
    out = _mk_scored(series, n_bins)
    return out.select(
        "x",
        "y",
        "total",
        F.round(F.element_at("cs", n_bins), 6).alias("gi_last"),
        F.col("s").alias("mk_s"),
        F.round(F.col("_z"), 6).alias("mk_z"),
    )
