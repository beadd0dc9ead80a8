"""Central-tendency features: mean center + geometric median (Weiszfeld).

ArcGIS Mean Center / Median Center (Spatial Statistics toolbox; the
median center is the geometric median — the point minimizing the SUM of
distances, the robust sibling of the mean center that one outlier cannot
drag).  Classic solver: Weiszfeld 1937 iteration,
c_{k+1} = Σ(p_i / d_i) / Σ(1 / d_i).

Cross-engine determinism problem: Weiszfeld's sums are float, and FLOAT
AGGREGATION ORDER DIFFERS between Spark and DuckDB (CLAUDE.md gotcha) —
a naive float replay can hash-mismatch.  The repo's fix is an
INTEGER-WEIGHTED Weiszfeld: each iteration computes the per-point weight

    w_i = floor(W / sqrt(d2_i + 1))          (W = 1e8, d2 exact int64)

row-wise (sqrt/divide/floor of the same int64 is IEEE-identical in both
engines), then advances the center with pure integer sums and ONE floor
division:  c = Σ(w_i * x_i) div Σ(w_i).  Integer sums are order-free, so
the whole iteration is bit-deterministic.  The +1 under the sqrt doubles
as the standard Weiszfeld singularity smoothing (a center sitting on a
data point would divide by zero).  Fixed iteration count, no convergence
probe — the rounds UNROLL into one Catalyst DAG exactly like
joins/map_match.py's Viterbi (no driver loop, no checkpoint barriers).

Coordinate contract: integer, non-negative, and small enough that
W * max_coord * group_rows < 2^63 (milli-degree-scale coordinates and
W = 1e8 leave two orders of headroom at a billion rows per group; for
larger groups drop W).

100 TB shape: the points relation (grp, x, y) is cached and re-read per
round; each round is one broadcast join against the K-row center table
plus one map-combined groupBy — nothing but (grp, w, wx, wy) longs ever
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

W_SCALE = 100_000_000  # 1e8: weight quantum (see overflow contract above)


def central_features(
    points: DataFrame,
    group_col: str = "grp",
    x_col: str = "x",
    y_col: str = "y",
    iters: int = 6,
) -> DataFrame:
    """Per group: point count, integer mean center, and the
    integer-weighted Weiszfeld geometric median after `iters` rounds
    (init = mean center).  Output: (grp, n, mean_x, mean_y, med_x,
    med_y) — all exact int64."""
    pts = points.select(
        F.col(group_col).alias("grp"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).cache()
    base = pts.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.expr("sum(x) div count(*)").alias("mean_x"),
        F.expr("sum(y) div count(*)").alias("mean_y"),
    )
    centers = base.select(
        "grp", F.col("mean_x").alias("cx"), F.col("mean_y").alias("cy")
    )
    for _ in range(int(iters)):
        j = pts.join(F.broadcast(centers), "grp").select(
            "grp", "x", "y",
            ((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
             + (F.col("y") - F.col("cy")) * (F.col("y") - F.col("cy"))).alias("d2"),
        )
        wexpr = F.expr(
            f"CAST(floor({W_SCALE} / sqrt(CAST(d2 + 1 AS DOUBLE))) AS BIGINT)"
        )
        agg = (
            j.select("grp", "x", "y", wexpr.alias("w"))
            .groupBy("grp")
            .agg(
                F.sum(F.col("w") * F.col("x")).alias("swx"),
                F.sum(F.col("w") * F.col("y")).alias("swy"),
                F.sum("w").alias("sw"),
            )
        )
        centers = agg.select(
            "grp",
            F.expr("swx div sw").alias("cx"),
            F.expr("swy div sw").alias("cy"),
        )
    return base.join(
        centers.select("grp", F.col("cx").alias("med_x"), F.col("cy").alias("med_y")),
        "grp",
    ).select("grp", "n", "mean_x", "mean_y", "med_x", "med_y")


def weiszfeld_round_sql(prev: str, w_scale: int = W_SCALE) -> str:
    """One oracle round: identical weight/advance arithmetic as SQL.
    `prev` is the name of the previous center CTE (grp, cx, cy)."""
    return f"""
      SELECT p.grp,
        CAST(sum(CAST(floor({w_scale} / sqrt(CAST(
              (p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy)
              + 1 AS DOUBLE))) AS BIGINT) * p.x) AS BIGINT)
          // CAST(sum(CAST(floor({w_scale} / sqrt(CAST(
              (p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy)
              + 1 AS DOUBLE))) AS BIGINT)) AS BIGINT) AS cx,
        CAST(sum(CAST(floor({w_scale} / sqrt(CAST(
              (p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy)
              + 1 AS DOUBLE))) AS BIGINT) * p.y) AS BIGINT)
          // CAST(sum(CAST(floor({w_scale} / sqrt(CAST(
              (p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy)
              + 1 AS DOUBLE))) AS BIGINT)) AS BIGINT) AS cy
      FROM pts p JOIN {prev} c ON c.grp = p.grp
      GROUP BY p.grp
    """
