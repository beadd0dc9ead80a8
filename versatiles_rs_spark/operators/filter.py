"""Pruning filters: geo-bbox, tile-bbox, zoom range.

Parity: the reference computes bbox/zoom pruning at plan-build time by
intersecting into the source's bbox pyramid and early-outs on empty
(/root/reference/versatiles_pipeline/src/operations/general/filter.rs:36-96);
here the same happens declaratively — the predicate is a plain column range,
so Catalyst pushes it into the scan (PushedFilters) and partition pruning
fires when the table is partitioned by z / block columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import tile_math as tm
from . import register_operator


def tile_bbox_predicate(bbox: tuple[int, int, int, int], x: str = "x", y: str = "y") -> Column:
    """Inclusive tile-bbox membership predicate."""
    x0, y0, x1, y1 = bbox
    return (
        (F.col(x) >= x0) & (F.col(x) <= x1) & (F.col(y) >= y0) & (F.col(y) <= y1)
    )


@register_operator("filter_tile_bbox")
def filter_tile_bbox(df: DataFrame, bbox, x: str = "x", y: str = "y") -> DataFrame:
    return df.filter(tile_bbox_predicate(bbox, x, y))


@register_operator("filter_geo_bbox")
def filter_geo_bbox(
    df: DataFrame,
    geo_bbox: tuple[float, float, float, float],
    zoom: int,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """GeoBBox -> tile-range predicate at `zoom` (eps-inset per
    tile_bbox/constructors.rs:258-266, computed driver-side)."""
    bbox = tm.geo_bbox_to_tile_bbox(zoom, *geo_bbox)
    return filter_tile_bbox(df, bbox, x, y)


@register_operator("filter_zoom")
def filter_zoom(
    df: DataFrame, level_min: int | None = None, level_max: int | None = None, z: str = "z"
) -> DataFrame:
    """Zoom-range filter (filter.rs:36-43 validates min<=max at build)."""
    if level_min is not None and level_max is not None and level_min > level_max:
        raise ValueError(f"level_min ({level_min}) > level_max ({level_max})")
    if level_min is not None:
        df = df.filter(F.col(z) >= level_min)
    if level_max is not None:
        df = df.filter(F.col(z) <= level_max)
    return df


@register_operator("filter_pyramid")
def filter_pyramid(df: DataFrame, geo_bbox, z_min: int, z_max: int) -> DataFrame:
    """Multi-level pyramid filter: OR of per-level tile bboxes
    (tile_bbox_pyramid.rs:87-93 enumeration)."""
    pyr = tm.bbox_pyramid(z_min, z_max, geo_bbox)
    pred = None
    for lvl, x0, y0, x1, y1 in pyr:
        p = (F.col("z") == lvl) & tile_bbox_predicate((x0, y0, x1, y1))
        pred = p if pred is None else (pred | p)
    return df.filter(pred)
