"""Spatial-interaction statistics: 2SFCA accessibility + Huff model.

Two-step floating catchment area (Luo & Wang 2003, the standard
health-care / service accessibility statistic in GIS): step 1 computes
each SUPPLY site's supply-to-demand ratio over the demand population
within its catchment radius; step 2 sums those ratios over every supply
site reachable from each DEMAND point.  High score = much nearby
capacity shared by few people.

Huff model (Huff 1963, the ArcGIS-Business-Analyst market-share
statistic): each demand point splits its unit of demand over the supply
sites within its catchment with probability proportional to
attractiveness / distance^2 (gravity decay); a site's expected market
capture is the sum of those probabilities.  Shares both the candidate
join and the exactness contract below.

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


def catchment_pairs(
    demand: DataFrame,
    supply: DataFrame,
    radius: int,
    value_col: str,
) -> DataFrame:
    """The shared candidate join: (pid, sid, <value_col>, d2) for every
    demand point / supply site pair within `radius`.  Supply sites
    explode to their 3x3 catchment-cell ring (cell side = radius, so
    the ring covers the disk), demand points live in exactly one cell,
    pairs meet exactly once (the near_segments / range_join no-dedup
    pattern).  Everything shuffled is (long, long).  localCheckpointed:
    every consumer reads it twice."""
    d = demand.select(
        F.col("pid"),
        F.col("px").cast("long"), F.col("py").cast("long"),
        F.expr(f"px div {radius}").alias("cx"),
        F.expr(f"py div {radius}").alias("cy"),
    )
    s = supply.select(
        F.col("sid"),
        F.col("sx").cast("long"), F.col("sy").cast("long"),
        F.col(value_col).cast("long"),
    )
    off = F.explode(
        F.array(*[
            F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        ])
    ).alias("o")
    se = s.select("sid", "sx", "sy", value_col, off).select(
        "sid", "sx", "sy", value_col,
        (F.expr(f"sx div {radius}") + F.col("o.ox")).alias("cx"),
        (F.expr(f"sy div {radius}") + F.col("o.oy")).alias("cy"),
    )
    r2 = int(radius) * int(radius)
    dx, dy = F.col("px") - F.col("sx"), F.col("py") - F.col("sy")
    return (
        d.join(se, ["cx", "cy"])
        .select("pid", "sid", value_col, (dx * dx + dy * dy).alias("d2"))
        .filter(F.col("d2") <= F.lit(r2))
        .localCheckpoint()  # built once, consumed by BOTH steps
    )


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
    pairs = catchment_pairs(demand, supply, radius, "capacity").select(
        "pid", "sid", "capacity"
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


def huff_market_share(
    demand: DataFrame,
    supply: DataFrame,
    radius: int,
    scale: int = 1_000_000_000_000,
    prob_scale: int = 1_000,
) -> DataFrame:
    """Huff 1963 gravity market share with beta=2 and a catchment bound
    (the standard radius-truncated form): demand point i's probability
    of choosing site j is w_ij / sum_k w_ik over in-range sites, with
    w_ij = attract_j * scale // (d2_ij + 1) — the inverse-square decay
    as an exact non-negative floor quotient (+1 guards the at-site
    pair; at milli-degree units one grid step is already ~111 m, so the
    +1 only breaks exact-coincidence ties).  Probabilities are
    prob_scale-precision floor quotients, so each demand point
    distributes AT MOST one unit of demand (the floor residue is
    dropped, deterministically on both engines).

    Zero-weight pairs (attract * scale < d2 + 1, possible only when
    scale is set far below the default) are dropped BEFORE the
    denominator so den > 0 always (Spark div-by-0 nulls where DuckDB
    errors — the pair captures nothing either way).  Overflow bound:
    max w = attract * scale (the d2=0 pair), and w * prob_scale must fit
    int64 — so attract * scale * prob_scale < 2^63, i.e. attract <= 9.2e3
    at the defaults (raise by lowering scale, which costs decay
    resolution at the catchment edge).

    Returns one row per supply site that captures anyone:
    (sid, n_reached, demand_milli, expected) with expected =
    demand_milli / prob_scale reconstructed exactly from the integer.

    100 TB shape: the shared catchment_pairs join (slim longs, 9-way
    supply-side explode only), one groupBy(pid) for denominators, one
    groupBy(sid) for shares.  Zero floats in any exchange."""
    pairs = catchment_pairs(demand, supply, radius, "attract").select(
        "pid", "sid",
        F.expr(f"(attract * {int(scale)}) div (d2 + 1)").alias("w"),
    ).filter(F.col("w") > 0)
    den = pairs.groupBy("pid").agg(F.sum("w").alias("den"))
    probs = pairs.join(den, "pid").select(
        "pid", "sid", F.expr(f"(w * {int(prob_scale)}) div den").alias("p"),
    )
    return (
        probs.groupBy("sid")
        .agg(
            F.count("*").alias("n_reached"),
            F.sum("p").alias("demand_milli"),
        )
        .select(
            "sid", "n_reached", "demand_milli",
            (F.col("demand_milli").cast("double") / F.lit(float(prob_scale)))
            .alias("expected"),
        )
    )
