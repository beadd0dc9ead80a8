"""Geofence crossing detection: trajectory segments x fence edges.

The event-stream sibling of the PIP join (joins/pip.py): PIP answers
"which points are inside", crossings answer "which MOVEMENTS entered or
left" — the geofencing primitive (alerting, border counting, session
geo-splitting).

Plan shape: consecutive points per entity become segments with ONE lag
window (the only shuffle, keyed by the entity); the fence layer is small
by contract and broadcast, edges pre-exploded; the segment-edge predicate
is the classic proper-intersection orientation test — four 2x2 cross
products, pure JVM column algebra, whole-stage codegen.  Output carries
only crossing rows.  For fence layers too large to broadcast, bucket both
sides by tile/H3 cell exactly like pip.py's cell-partitioned variant and
run this predicate per cell.

Touching endpoints (an orientation of exactly 0) does NOT count as a
crossing — strict inequalities keep the predicate deterministic under
float replay in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _orient(ax: Column, ay: Column, bx: Column, by: Column, px: Column, py: Column) -> Column:
    """Sign-carrying cross product (b-a) x (p-a)."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def segments(
    df: DataFrame,
    entity_col: str,
    order_col: str,
    x_col: str = "lon",
    y_col: str = "lat",
) -> DataFrame:
    """Consecutive-point segments per entity: (entity, order, x1,y1,x2,y2).
    One lag window; the first point of each entity yields no segment."""
    w = Window.partitionBy(entity_col).orderBy(order_col)
    out = df.select(
        entity_col,
        order_col,
        F.lag(x_col).over(w).alias("x1"),
        F.lag(y_col).over(w).alias("y1"),
        F.col(x_col).alias("x2"),
        F.col(y_col).alias("y2"),
    )
    return out.filter(F.col("x1").isNotNull())


def fence_crossings(
    segs: DataFrame,
    fences: DataFrame,
    fence_id: str = "fence_id",
    edge_x1: str = "ex1",
    edge_y1: str = "ey1",
    edge_x2: str = "ex2",
    edge_y2: str = "ey2",
) -> DataFrame:
    """Rows of `segs` that PROPERLY cross a fence edge, one row per
    (segment, edge) crossing.  `fences` holds pre-exploded edges and is
    broadcast (small by contract — see module docstring for the bucketed
    variant at scale)."""
    s, e = segs.alias("s"), F.broadcast(fences).alias("e")
    d1 = _orient(F.col("s.x1"), F.col("s.y1"), F.col("s.x2"), F.col("s.y2"),
                 F.col(f"e.{edge_x1}"), F.col(f"e.{edge_y1}"))
    d2 = _orient(F.col("s.x1"), F.col("s.y1"), F.col("s.x2"), F.col("s.y2"),
                 F.col(f"e.{edge_x2}"), F.col(f"e.{edge_y2}"))
    d3 = _orient(F.col(f"e.{edge_x1}"), F.col(f"e.{edge_y1}"),
                 F.col(f"e.{edge_x2}"), F.col(f"e.{edge_y2}"),
                 F.col("s.x1"), F.col("s.y1"))
    d4 = _orient(F.col(f"e.{edge_x1}"), F.col(f"e.{edge_y1}"),
                 F.col(f"e.{edge_x2}"), F.col(f"e.{edge_y2}"),
                 F.col("s.x2"), F.col("s.y2"))
    return s.join(e, (d1 * d2 < 0) & (d3 * d4 < 0))


def polygon_edges(
    fences: DataFrame,
    fence_id: str = "fence_id",
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> DataFrame:
    """Explode ring arrays into per-edge rows (closing edge included)."""
    n = F.size(xs_col)
    idx = F.explode(F.sequence(F.lit(1), n)).alias("i")
    out = fences.select(fence_id, xs_col, ys_col, idx)
    nxt = F.pmod(F.col("i"), F.size(xs_col)) + F.lit(1)
    return out.select(
        fence_id,
        F.col("i").alias("edge_idx"),
        F.element_at(xs_col, F.col("i").cast("int")).alias("ex1"),
        F.element_at(ys_col, F.col("i").cast("int")).alias("ey1"),
        F.element_at(xs_col, nxt.cast("int")).alias("ex2"),
        F.element_at(ys_col, nxt.cast("int")).alias("ey2"),
    )
