"""Areal interpolation: value reaggregation between overlapping zone layers.

The ArcGIS Areal Interpolation / Tobler areal-weighting primitive over
axis-aligned zone rectangles (the SQL-checkable slice of polygon overlay,
like joins/pip.py's rect tier): a source layer carries a count-like value
per zone; each target zone receives SUM over sources of
value * |overlap| / |source| — population reaggregated proportionally to
overlapping area.

Exactness contract: zone corners are INTEGER (milli-degree) coordinates,
so every overlap area is an exact int64 product, and the per-pair weight
is the milli-precision floor quotient value * ox * oy * 1000 // area_src
(floor per PAIR, then an exact integer sum — the same idiom as the
co-location participation index; a float weight sum would hash-diverge on
addition order).  Intervals are half-open [x0, x1) to mirror the tile
convention, so abutting zones never double-count.

Distributed shape: the source layer broadcasts (zone layers are the small
side of this workload — census tracts vs web-scale points is pip.py's
job; here both sides are zones).  When BOTH layers outgrow a broadcast,
assign each candidate pair to the ONE grid cell containing the overlap's
min corner (max(x0a, x0b), max(y0a, y0b)) — an exact equi-key that needs
no dedup pass, the range_join.py trick in 2-D; that variant reuses the
same pair predicate and is plan-compatible with AQE skew handling.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def dissolve_area(rects: DataFrame) -> DataFrame:
    """Dissolve-by-attribute union area (PostGIS ST_Area(ST_Union(geom))
    GROUP BY attr; ArcGIS Dissolve) for half-open integer rect zones:
    per group, the EXACT area of the union of its rectangles — overlaps
    counted once — plus rect count and union bbox.

    Shape (pure JVM, two window shuffles on the group key):
      1. vertical strips: the distinct x-corners of a group partition its
         extent into strips (lead window);
      2. each strip joins the rects that span it (a strip never partially
         overlaps a rect by construction — equi-join on the group key
         with range residuals);
      3. per (group, strip), overlapping y-intervals merge with the
         islands-and-gaps windows (running max of previous y1), covered
         length = sum over islands of (max y1 - min y0);
      4. area = sum of covered length x strip width.

    Work is O(k^2) per group in the worst case (k rects all overlapping
    in x) but every row is slim longs; groups are attribute zones, which
    are bounded by contract (a county's parcels, a class's footprints).
    Input: (gid, x0, x1, y0, y1)."""
    r = rects.select(
        F.col("gid"),
        F.col("x0").cast("long"), F.col("x1").cast("long"),
        F.col("y0").cast("long"), F.col("y1").cast("long"),
    )
    xs = (
        r.select("gid", F.col("x0").alias("x"))
        .unionByName(r.select("gid", F.col("x1").alias("x")))
        .distinct()
    )
    wx = Window.partitionBy("gid").orderBy("x")
    strips = (
        xs.select("gid", F.col("x").alias("sx0"), F.lead("x").over(wx).alias("sx1"))
        .filter(F.col("sx1").isNotNull())
    )
    cover = strips.join(r, "gid").filter(
        (F.col("x0") <= F.col("sx0")) & (F.col("x1") >= F.col("sx1"))
    )
    wy = (
        Window.partitionBy("gid", "sx0")
        .orderBy("y0", "y1")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = cover.select(
        "gid", "sx0", "sx1", "y0", "y1",
        F.when(
            F.col("y0") > F.coalesce(F.max("y1").over(wy), F.lit(-(1 << 62))),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("brk"),
    )
    wrun = Window.partitionBy("gid", "sx0").orderBy("y0", "y1")
    isl = isl.withColumn("island", F.sum("brk").over(wrun))
    per_island = isl.groupBy("gid", "sx0", "sx1", "island").agg(
        (F.max("y1") - F.min("y0")).alias("covered")
    )
    per_strip = per_island.groupBy("gid", "sx0", "sx1").agg(
        F.sum("covered").alias("cov")
    )
    areas = per_strip.groupBy("gid").agg(
        F.sum((F.col("sx1") - F.col("sx0")) * F.col("cov")).alias("union_area")
    )
    stats = r.groupBy("gid").agg(
        F.count("*").alias("n_rects"),
        F.min("x0").alias("min_x"), F.min("y0").alias("min_y"),
        F.max("x1").alias("max_x"), F.max("y1").alias("max_y"),
    )
    return stats.join(areas, "gid", "left").select(
        "gid", "n_rects",
        F.coalesce("union_area", F.lit(0)).alias("union_area"),
        "min_x", "min_y", "max_x", "max_y",
    )


def areal_interpolate(
    src: DataFrame,
    tgt: DataFrame,
    scale: int = 1000,
) -> DataFrame:
    """src: (src_id, x0, x1, y0, y1, value) integer-corner half-open
    rects; tgt: (tgt_id, x0, x1, y0, y1).  Returns one row per target:
    (tgt_id, n_src, overlap_area, est_milli) with est_milli =
    SUM(value * overlap * scale // src_area) — exact integers end to end.
    Targets overlapping nothing keep n_src = 0, est_milli = 0."""
    s = src.select(
        F.col("src_id"),
        F.col("x0").cast("long").alias("sx0"), F.col("x1").cast("long").alias("sx1"),
        F.col("y0").cast("long").alias("sy0"), F.col("y1").cast("long").alias("sy1"),
        F.col("value").cast("long").alias("value"),
    )
    t = tgt.select(
        F.col("tgt_id"),
        F.col("x0").cast("long").alias("tx0"), F.col("x1").cast("long").alias("tx1"),
        F.col("y0").cast("long").alias("ty0"), F.col("y1").cast("long").alias("ty1"),
    )
    ox = F.least("sx1", "tx1") - F.greatest("sx0", "tx0")
    oy = F.least("sy1", "ty1") - F.greatest("sy0", "ty0")
    pairs = t.join(
        F.broadcast(s),
        (F.col("sx0") < F.col("tx1")) & (F.col("tx0") < F.col("sx1"))
        & (F.col("sy0") < F.col("ty1")) & (F.col("ty0") < F.col("sy1")),
        "left",
    ).select(
        "tgt_id",
        F.col("src_id").isNotNull().cast("long").alias("hit"),
        # least/greatest IGNORE nulls (both engines), so an unmatched
        # left-join row would otherwise yield ov = the full target area —
        # gate the product on the join hit, not on null propagation.
        F.when(F.col("src_id").isNull(), F.lit(0)).otherwise(ox * oy).alias("ov"),
        F.coalesce(
            (F.col("value") * ox * oy * F.lit(scale)).cast("long"), F.lit(0)
        ).alias("num"),
        F.coalesce(
            (F.col("sx1") - F.col("sx0")) * (F.col("sy1") - F.col("sy0")),
            F.lit(1),
        ).alias("den"),
    )
    # floor quotient per pair (operands are non-negative: Spark `div` ==
    # DuckDB `//` there — the round-half-tie lesson's integer-division rule)
    contrib = pairs.select(
        "tgt_id", "hit", "ov",
        F.expr("num div den").alias("est"),
    )
    return contrib.groupBy("tgt_id").agg(
        F.sum("hit").alias("n_src"),
        F.sum("ov").alias("overlap_area"),
        F.sum("est").alias("est_milli"),
    )
