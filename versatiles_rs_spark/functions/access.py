"""Two-step floating catchment area (2SFCA) spatial accessibility.

Luo & Wang 2003 (the standard health-care / service accessibility
statistic in GIS): step 1 computes each SUPPLY site's
supply-to-demand ratio over the demand population within its catchment
radius; step 2 sums those ratios over every supply site reachable from
each DEMAND point.  High score = much nearby capacity shared by few
people.

Exactness contract: coordinates quantized to non-negative integer
milli-degrees, catchment test = int64 squared distance, ratios as
SCALE-precision floor quotients (capacity * SCALE // demand_count —
non-negative `div` == DuckDB `//`), accessibility = exact integer sum
of ratios.  Zero floats anywhere.

Distributed shape: ONE candidate pair join built once and reused by
both steps — supply sites explode to their 3x3 catchment-cell ring
(cell side = radius, so the ring covers the disk), demand points live
in exactly one cell, pairs meet exactly once (the near_segments /
range_join no-dedup pattern).  Everything shuffled is (long, long).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def two_step_fca(
    demand: DataFrame,
    supply: DataFrame,
    radius: int,
    scale: int = 1_000_000,
) -> DataFrame:
    """demand: (pid, px, py); supply: (sid, sx, sy, capacity) — integer,
    non-negative coordinates (same unit as `radius`).  Returns one row
    per demand point WITH at least one reachable supply site:
    (pid, n_supply, access) where access = SUM over reachable sites of
    capacity * scale // (demand count within the site's catchment)."""
    d = demand.select(
        F.col("pid"),
        F.col("px").cast("long"), F.col("py").cast("long"),
        F.expr(f"px div {radius}").alias("cx"),
        F.expr(f"py div {radius}").alias("cy"),
    )
    s = supply.select(
        F.col("sid"),
        F.col("sx").cast("long"), F.col("sy").cast("long"),
        F.col("capacity").cast("long"),
    )
    off = F.explode(
        F.array(*[
            F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        ])
    ).alias("o")
    se = s.select("sid", "sx", "sy", "capacity", off).select(
        "sid", "sx", "sy", "capacity",
        (F.expr(f"sx div {radius}") + F.col("o.ox")).alias("cx"),
        (F.expr(f"sy div {radius}") + F.col("o.oy")).alias("cy"),
    )
    r2 = int(radius) * int(radius)
    dx, dy = F.col("px") - F.col("sx"), F.col("py") - F.col("sy")
    pairs = (
        d.join(se, ["cx", "cy"])
        .filter(dx * dx + dy * dy <= F.lit(r2))
        .select("pid", "sid", "capacity")
        .localCheckpoint()  # built once, consumed by BOTH steps
    )
    ratios = pairs.groupBy("sid").agg(
        F.count("*").alias("dcnt"), F.min("capacity").alias("cap")
    ).select(
        "sid", F.expr(f"(cap * {scale}) div dcnt").alias("ratio")
    )
    return (
        pairs.join(ratios, "sid")
        .groupBy("pid")
        .agg(F.count("*").alias("n_supply"), F.sum("ratio").alias("access"))
    )
