"""Furness / IPF balancing of origin-destination matrices.

The transport-planning workhorse (Furness 1965; iterative proportional
fitting, Deming-Stephan 1940; the doubly-constrained gravity model of
every four-step travel demand system): scale a seed OD matrix so its row
sums hit origin targets and its column sums hit destination targets,
alternating row and column factors.

Cross-engine determinism: classic IPF is float ratios; the repo's
variant is FIXED-POINT Furness — the matrix lives in milli-units
(w0 = seed * 1000) and each half-step applies

    w' = (w * (target * 1000)) div current_sum        (all int64)

a single floor division per entry per step (`div` on non-negative ints
== DuckDB `//`).  Fixed round count, no convergence probe.  The rounds
unroll into ONE Catalyst DAG (map_match/center pattern — no driver loop);
each half-step is one map-combined groupBy for the sums plus one join
back, so only (key, w) longs ever shuffle.  Overflow contract:
max_w_milli * max_target * 1000 < 2^63 (callers with city-scale trip
totals stay ~5 orders under it).

Convergence caveat (documented, inherent to IPF): with inconsistent
target totals (ΣO != ΣD) the alternation oscillates toward a
least-inconsistent compromise — fixed rounds report that compromise
deterministically rather than failing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def furness_balance(
    seed: DataFrame,
    row_targets: DataFrame,
    col_targets: DataFrame,
    rounds: int = 3,
) -> DataFrame:
    """Balance `seed` (o, d, w) against `row_targets` (o, t) and
    `col_targets` (d, t) with `rounds` full (row + column) fixed-point
    Furness rounds.  Returns (o, d, w_milli) — the balanced matrix in
    milli-units.

    Each half-step is a WINDOW sum partitioned by the balanced axis —
    NOT a groupBy + self-join: referencing the evolving matrix twice per
    step would duplicate its whole lineage each round (2^rounds
    recomputation, the relational shape of the lambda-CSE lesson).  The
    window keeps the lineage linear, so all 2*rounds steps run as one
    straight-line DAG with one exchange per half-step (keyed o, d,
    o, d, ... — nothing but the (o, d, w) longs in any of them)."""
    from pyspark.sql import Window

    w = seed.select("o", "d", (F.col("w").cast("long") * 1000).alias("w"))
    rt = F.broadcast(row_targets.select("o", F.col("t").alias("t_o")))
    ct = F.broadcast(col_targets.select("d", F.col("t").alias("t_d")))
    wo, wd = Window.partitionBy("o"), Window.partitionBy("d")
    for _ in range(int(rounds)):
        w = (
            w.withColumn("s", F.sum("w").over(wo))
            .join(rt, "o")
            .select("o", "d", F.expr("(w * (t_o * 1000)) div s").alias("w"))
        )
        w = (
            w.withColumn("s", F.sum("w").over(wd))
            .join(ct, "d")
            .select("o", "d", F.expr("(w * (t_d * 1000)) div s").alias("w"))
        )
    return w.select("o", "d", F.col("w").alias("w_milli"))


def furness_step_sql(prev: str, axis: str, target_cte: str) -> str:
    """One oracle half-step (axis 'o' or 'd'): identical fixed-point
    arithmetic; `prev` MUST be a MATERIALIZED CTE — it is referenced
    twice here (sum subquery + join), the exact shape of the
    CTE-inlining lesson."""
    t = "t_o" if axis == "o" else "t_d"
    return f"""
      SELECT w.o, w.d, (w.w * ({target_cte}.{t} * 1000)) // s.s AS w
      FROM {prev} w
      JOIN (SELECT {axis}, CAST(sum(w) AS BIGINT) AS s
            FROM {prev} GROUP BY {axis}) s ON s.{axis} = w.{axis}
      JOIN {target_cte} ON {target_cte}.{axis} = w.{axis}
    """
