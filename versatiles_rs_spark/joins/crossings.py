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


def segment_intersections(
    a: DataFrame,
    b: DataFrame,
    cell: int,
    a_id: str = "a_id",
    b_id: str = "b_id",
) -> DataFrame:
    """Proper-intersection join between two LARGE segment layers (road
    networks, utility lines) — the layer-x-layer sibling of
    fence_crossings, with no broadcast side.

    Inputs carry INTEGER, NON-NEGATIVE endpoint coordinates
    (id, x1, y1, x2, y2) — integer cross products make every orientation
    test exact, and non-negative operands make `div`-bucketing equal to
    DuckDB's `//` (the round-half-tie lesson's integer-division rule).

    Shape: each segment explodes to the grid cells its BBOX covers
    (fan-out = O(length/cell), bounded for map-scale segments); candidates
    meet in an equi-join on the packed cell; each surviving pair is
    counted EXACTLY once by keeping only the cell that contains the min
    corner of the two bboxes' intersection (the same no-dedup-pass trick
    as range_join.py, lifted to 2-D).  Orientation signs are compared
    explicitly ((d1>0 AND d2<0) OR ...) — a d1*d2 product of int cross
    terms could overflow int64.  Touching endpoints (any orientation 0)
    do not count, matching fence_crossings.
    """
    def prep(df, idc, p):
        return df.select(
            F.col(idc),
            F.col("x1").cast("long").alias(f"{p}x1"),
            F.col("y1").cast("long").alias(f"{p}y1"),
            F.col("x2").cast("long").alias(f"{p}x2"),
            F.col("y2").cast("long").alias(f"{p}y2"),
            F.expr(f"least(x1, x2) div {cell}").alias("cx0"),
            F.expr(f"greatest(x1, x2) div {cell}").alias("cx1"),
            F.expr(f"least(y1, y2) div {cell}").alias("cy0"),
            F.expr(f"greatest(y1, y2) div {cell}").alias("cy1"),
        ).select(
            idc, f"{p}x1", f"{p}y1", f"{p}x2", f"{p}y2",
            F.explode(F.sequence("cx0", "cx1")).alias("cx"),
            "cy0", "cy1",
        ).select(
            idc, f"{p}x1", f"{p}y1", f"{p}x2", f"{p}y2", "cx",
            F.explode(F.sequence("cy0", "cy1")).alias("cy"),
        )

    ae = prep(a, a_id, "a")
    be = prep(b, b_id, "b")
    pairs = ae.join(be, ["cx", "cy"])
    # canonical cell = the one containing the bbox-intersection min corner
    canon_x = F.expr(
        f"greatest(least(ax1, ax2), least(bx1, bx2)) div {cell}"
    ) == F.col("cx")
    canon_y = F.expr(
        f"greatest(least(ay1, ay2), least(by1, by2)) div {cell}"
    ) == F.col("cy")
    d1 = _orient(F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2"),
                 F.col("bx1"), F.col("by1"))
    d2 = _orient(F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2"),
                 F.col("bx2"), F.col("by2"))
    d3 = _orient(F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"),
                 F.col("ax1"), F.col("ay1"))
    d4 = _orient(F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"),
                 F.col("ax2"), F.col("ay2"))
    opp = lambda u, v: ((u > 0) & (v < 0)) | ((u < 0) & (v > 0))
    return pairs.filter(canon_x & canon_y & opp(d1, d2) & opp(d3, d4)).select(
        a_id, b_id
    )


def points_near_segments(
    points: DataFrame,
    segs: DataFrame,
    dist: int,
    cell: int,
    point_id: str = "pid",
    seg_id: str = "sid",
    probe_partitions: int | None = None,
) -> DataFrame:
    """ST_DWithin for a point layer against a segment layer (PostGIS
    ST_DWithin / ArcGIS Near's search-radius form): all (point, segment)
    pairs with exact squared point-segment distance <= dist^2.

    Integer, non-negative coordinates; the test is EXACT int64 rational
    arithmetic with no division: with a, b the endpoints and p the point,
      t = (p-a)·(b-a), L = |b-a|^2:
        0 <= t <= L  ->  perpendicular case: cross(b-a, p-a)^2 <= dist^2 * L
        else         ->  nearer-endpoint case: min(|p-a|^2, |p-b|^2) <= dist^2
    All operands are DIFFERENCES bounded by the candidate radius, so the
    squares stay far under int64 even though absolute coordinates are
    large.

    Candidates: each segment explodes to the cells of its bbox EXPANDED
    by `dist` (any qualifying point lies inside that expansion); a point
    lives in exactly ONE cell, so each candidate pair meets exactly once —
    no dedup pass.  One packed-cell equi-join, pure JVM."""
    p = points.select(
        F.col(point_id),
        F.col("px").cast("long"), F.col("py").cast("long"),
        F.expr(f"px div {cell}").alias("cx"),
        F.expr(f"py div {cell}").alias("cy"),
    )
    s = segs.select(
        F.col(seg_id),
        F.col("x1").cast("long").alias("sx1"), F.col("y1").cast("long").alias("sy1"),
        F.col("x2").cast("long").alias("sx2"), F.col("y2").cast("long").alias("sy2"),
        F.expr(f"(least(x1, x2) - {dist}) div {cell}").alias("cx0"),
        F.expr(f"(greatest(x1, x2) + {dist}) div {cell}").alias("cx1"),
        F.expr(f"(least(y1, y2) - {dist}) div {cell}").alias("cy0"),
        F.expr(f"(greatest(y1, y2) + {dist}) div {cell}").alias("cy1"),
    )
    # NOTE: least(x1,x2) - dist can go negative only if coords < dist at the
    # world edge; require callers to shift by at least `dist` so the floor
    # bucketing stays in div == // territory.
    # the candidate-predicate work rides the SEGMENT side's partitioning
    # (the points broadcast at toy scale), and a small dim table read from
    # one parquet file would run the whole explode+join on ONE task —
    # spread the slim seg rows across the cluster first (skip with
    # probe_partitions=0 when the input is already wide)
    if probe_partitions is None:
        probe_partitions = 2 * segs.sparkSession.sparkContext.defaultParallelism
    if probe_partitions:
        s = s.repartition(int(probe_partitions))
    # segment-constant terms (L, expanded bbox) computed ONCE per segment
    # row before the cell explode, not once per candidate pair
    se = s.select(
        seg_id, "sx1", "sy1", "sx2", "sy2",
        (
            (F.col("sx2") - F.col("sx1")) * (F.col("sx2") - F.col("sx1"))
            + (F.col("sy2") - F.col("sy1")) * (F.col("sy2") - F.col("sy1"))
        ).alias("sL"),
        (F.least("sx1", "sx2") - F.lit(int(dist))).alias("bx0"),
        (F.greatest("sx1", "sx2") + F.lit(int(dist))).alias("bx1"),
        (F.least("sy1", "sy2") - F.lit(int(dist))).alias("by0"),
        (F.greatest("sy1", "sy2") + F.lit(int(dist))).alias("by1"),
        F.explode(F.sequence("cx0", "cx1")).alias("cx"), "cy0", "cy1",
    ).select(
        seg_id, "sx1", "sy1", "sx2", "sy2", "sL", "bx0", "bx1", "by0", "by1",
        "cx",
        F.explode(F.sequence("cy0", "cy1")).alias("cy"),
    )
    # cheap 4-comparison bbox gate FIRST: a cell only partially overlaps the
    # expanded bbox, so this drops a large fraction of candidates before the
    # ~15-multiply exact rational predicate runs
    bbox_hit = (
        (F.col("px") >= F.col("bx0")) & (F.col("px") <= F.col("bx1"))
        & (F.col("py") >= F.col("by0")) & (F.col("py") <= F.col("by1"))
    )
    pairs = p.join(se, ["cx", "cy"]).filter(bbox_hit)
    dx, dy = F.col("sx2") - F.col("sx1"), F.col("sy2") - F.col("sy1")
    pax, pay = F.col("px") - F.col("sx1"), F.col("py") - F.col("sy1")
    pbx, pby = F.col("px") - F.col("sx2"), F.col("py") - F.col("sy2")
    L = F.col("sL")
    t = pax * dx + pay * dy
    cross = dx * pay - dy * pax
    d2 = F.lit(int(dist) * int(dist))
    perp = (t >= 0) & (t <= L) & (L > 0) & (cross * cross <= d2 * L)
    ends = F.least(pax * pax + pay * pay, pbx * pbx + pby * pby) <= d2
    keep = F.when((L > 0) & (t >= 0) & (t <= L), perp).otherwise(ends)
    return pairs.filter(keep).select(point_id, seg_id)


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
