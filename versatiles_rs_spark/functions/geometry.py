"""Polygon scalar metrics as PURE JVM higher-order expressions.

Area (shoelace), perimeter, and area-weighted centroid over ring arrays
(xs, ys double arrays, implicit closure) — built entirely from
transform/aggregate/element_at column expressions, so they run inside
whole-stage codegen with NO Python worker (plan-gated), vectorize for
free, and replay verbatim in DuckDB list_transform/list_sum SQL.

This is the ST_Area/ST_Centroid/ST_Perimeter tier of a spatial engine
expressed Spark-first: geometry stays a pair of array columns (the same
representation outline.py and vector_tile.py use), and the math is column
algebra rather than a geometry library call — the reference's geo crate
usage (tile_outline/mod.rs:60-66) needs none of this because it never
computes metrics; training-data geo filtering (e.g. drop degenerate or
hair-thin footprint polygons) does.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _wrap(i: Column, n: Column) -> Column:
    """Next vertex index with ring wraparound (1-based arrays)."""
    return F.pmod(i, n) + F.lit(1)


def _cross_terms(xs: Column, ys: Column) -> Column:
    """Per-edge cross products x_i*y_{i+1} - x_{i+1}*y_i (index order)."""
    n = F.size(xs)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.element_at(xs, i) * F.element_at(ys, _wrap(i, n))
        - F.element_at(xs, _wrap(i, n)) * F.element_at(ys, i),
    )


def signed_area_expr(xs: Column, ys: Column) -> Column:
    """Shoelace signed area (positive = counter-clockwise ring)."""
    return F.aggregate(_cross_terms(xs, ys), F.lit(0.0), lambda a, b: a + b) / 2


def area_expr(xs: Column, ys: Column) -> Column:
    return F.abs(signed_area_expr(xs, ys))


def perimeter_expr(xs: Column, ys: Column) -> Column:
    n = F.size(xs)
    edges = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.sqrt(
            F.pow(F.element_at(xs, _wrap(i, n)) - F.element_at(xs, i), F.lit(2.0))
            + F.pow(F.element_at(ys, _wrap(i, n)) - F.element_at(ys, i), F.lit(2.0))
        ),
    )
    return F.aggregate(edges, F.lit(0.0), lambda a, b: a + b)


def point_in_ring_expr(px: Column, py: Column, xs: list[float], ys: list[float]) -> Column:
    """Crossing-number inside test against a FIXED ring whose vertices are
    inlined at plan time — fully JVM column algebra (the numpy probe in
    joins/pip.py is for polygon LAYERS; this is the single-fence hot
    path).  Half-open edge rule: strictly-above vs not-above, so edge
    touches resolve deterministically.  Horizontal edges are inert: the
    `!=` gate is false on both sides, and `false AND x` is false in both
    Spark (x = ±inf comparison) and DuckDB (x = NULL from /0) — the
    division's engine-specific 0-denominator value never matters."""
    n = len(xs)
    terms = []
    for i in range(n):
        j = (i + 1) % n
        if ys[i] == ys[j]:
            continue  # horizontal edge: the crossing gate is identically false
        crosses = (F.lit(ys[i]) > py) != (F.lit(ys[j]) > py)
        xcut = (
            (F.lit(xs[j]) - F.lit(xs[i]))
            * (py - F.lit(ys[i]))
            / (F.lit(ys[j]) - F.lit(ys[i]))
            + F.lit(xs[i])
        )
        terms.append(F.when(crosses & (px < xcut), 1).otherwise(0))
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    return F.pmod(s, F.lit(2)) == 1


def centroid_exprs(xs: Column, ys: Column) -> tuple[Column, Column]:
    """Area-weighted polygon centroid (the standard 1/(6A) cross-weighted
    vertex sum); exact for any simple ring, unlike a vertex mean."""
    n = F.size(xs)
    a2 = F.aggregate(_cross_terms(xs, ys), F.lit(0.0), lambda a, b: a + b)

    def cross_i(i):
        # inlined per-edge cross product: referencing a shared transform()
        # array from inside another lambda re-inlines the WHOLE array per
        # index (no CSE through HOF lambdas — CLAUDE.md), turning O(n)
        # into O(n^2); computing cross_i locally keeps it O(n)
        return F.element_at(xs, i) * F.element_at(ys, _wrap(i, n)) - F.element_at(
            xs, _wrap(i, n)
        ) * F.element_at(ys, i)

    cx_terms = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: (F.element_at(xs, i) + F.element_at(xs, _wrap(i, n))) * cross_i(i),
    )
    cy_terms = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: (F.element_at(ys, i) + F.element_at(ys, _wrap(i, n))) * cross_i(i),
    )
    cx = F.aggregate(cx_terms, F.lit(0.0), lambda a, b: a + b) / (F.lit(3.0) * a2)
    cy = F.aggregate(cy_terms, F.lit(0.0), lambda a, b: a + b) / (F.lit(3.0) * a2)
    return cx, cy
