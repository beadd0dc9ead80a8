"""Multi-zoom marker clustering (supercluster-style) over the tile grid.

The map-rendering companion of the count pyramid (queries.pyramid_rollup):
web map UIs cluster point markers per zoom level so a world view shows a
few hundred bubbles instead of millions of pins (Mapbox's `supercluster`
is the canonical implementation). The greedy radius-merge supercluster
uses is order-dependent — a nondeterminism the engine's cross-engine hash
contract cannot accept — so this is the deterministic grid variant the
same UIs accept (Leaflet.markercluster's grid mode): markers merge per
tile cell at the deepest zoom, and parent zooms merge child CLUSTERS by
quadtree parentage, carrying exact weighted centroids.

Determinism: centroids are kept as int64 sums of floor((coord + shift)
* 1e7) NON-NEGATIVE micro-degree quantizations — summation order cannot
change the result, unlike summing doubles — and divided out with exact
int64 floor division (identical for non-negative operands across Spark's
`div` and DuckDB's `//`; no round() call ever runs, so there is no
half-tie to disagree on). The final lon/lat is the exact float
reconstruction centroid/1e7 - shift, bit-identical cross-engine.
Documented bound: the sums re-aggregate up the pyramid, so the binding
constraint is the COARSEST output cell — points-per-min_zoom-cell *
3.6e9 < 2^63, i.e. ~2.5e9 points under one min_zoom cell before the
centroid sum wraps (Spark wraps silently, DuckDB raises — the gate
would catch the divergence, but raise min_zoom rather than rely on it).
The cluster id is min(point id): stable, join-backable.

100 TB shape: ONE point-level shuffle (the base-zoom cell aggregation);
every higher zoom re-aggregates the already-slim occupied-cell relation
(log-depth, like the raster pyramid). Skewed megacity cells are exactly
what clustering collapses — they become single rows after the base agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..udfs import tile_x_expr, tile_y_expr

_Q = 1e7  # micro-degree quantizer (~1.1 cm at the equator)


def marker_cluster_pyramid(
    points: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "id",
    min_zoom: int = 4,
    max_zoom: int = 8,
) -> DataFrame:
    """(z, x, y, n_points, cluster_id, lon, lat) for every occupied cell
    at each zoom in [min_zoom, max_zoom] — one marker bubble per row, with
    the exact weighted centroid of its member points and the smallest
    member id as the stable cluster id."""
    base = (
        points.select(
            tile_x_expr(F.col(lon_col), F.lit(max_zoom)).alias("x"),
            tile_y_expr(F.col(lat_col), F.lit(max_zoom)).alias("y"),
            F.floor((F.col(lon_col) + F.lit(180.0)) * F.lit(_Q))
            .cast("long")
            .alias("qlon"),
            F.floor((F.col(lat_col) + F.lit(90.0)) * F.lit(_Q))
            .cast("long")
            .alias("qlat"),
            F.col(id_col).alias("pid"),
        )
        .groupBy("x", "y")
        .agg(
            F.count("*").alias("n"),
            F.sum("qlon").alias("sx"),
            F.sum("qlat").alias("sy"),
            F.min("pid").alias("cid"),
        )
        .cache()
    )
    levels = []
    for z in range(max_zoom, min_zoom - 1, -1):
        dz = max_zoom - z
        lv = base.groupBy(
            F.lit(z).cast("int").alias("z"),
            F.shiftright(F.col("x"), dz).alias("x"),
            F.shiftright(F.col("y"), dz).alias("y"),
        ).agg(
            F.sum("n").cast("long").alias("n_points"),
            F.min("cid").alias("cluster_id"),
            F.sum("sx").alias("sx"),
            F.sum("sy").alias("sy"),
        )
        levels.append(
            lv.select(
                "z",
                "x",
                "y",
                "n_points",
                "cluster_id",
                (
                    F.expr("sx div n_points").cast("double") / F.lit(_Q)
                    - F.lit(180.0)
                ).alias("lon"),
                (
                    F.expr("sy div n_points").cast("double") / F.lit(_Q)
                    - F.lit(90.0)
                ).alias("lat"),
            )
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
