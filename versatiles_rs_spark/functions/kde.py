"""Kernel-density heatmap over the tile grid — the web map "heat layer".

Every mapping stack ships a heatmap layer (Leaflet.heat, Mapbox
heatmap-*); the underlying operator is a kernel-density estimate on a
grid. This is the deterministic integer variant: a separable binomial
kernel (Pascal-row weights, the discrete Gaussian — B2 = [1 4 6 4 1]
outer B2 for radius 2, sigma ~ 1 cell) convolved over the per-cell event
counts. INTEGER weights x INTEGER counts mean the whole statistic —
distribution, aggregation, output — is exact int64: the only query in
the spatial-stats suite with zero float anywhere, so the cross-engine
hash contract is trivially tight.

100 TB shape: identical to hotspots.py — one slim (cell, count)
aggregation over the point table, then a (2r+1)^2-way explode on the
AGGREGATED occupied-cell relation (bounded by occupied cells, never
points) and one slim re-aggregation. Density spreads to the kernel
footprint of occupied cells, which is exactly what the heat layer
renders; cells_to_choropleth_tiles turns the surface into servable MVT.
"""

from __future__ import annotations

from math import comb

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def binomial_kernel(radius: int) -> list[int]:
    """Pascal row C(2r, 0..2r) — the discrete Gaussian of sigma ~ sqrt(r/2)."""
    return [comb(2 * radius, k) for k in range(2 * radius + 1)]


def kde_heatmap(
    points: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    zoom: int = 6,
    radius: int = 2,
) -> DataFrame:
    """(x, y, density) for every cell within `radius` of an occupied cell:
    density = sum over the (2r+1)^2 neighborhood of count * wx * wy with
    binomial weights — exact int64 end to end."""
    from .hotspots import cell_counts

    return kde_from_counts(cell_counts(points, lon_col, lat_col, zoom), zoom, radius)


def kde_from_counts(cells: DataFrame, zoom: int = 6, radius: int = 2) -> DataFrame:
    """The convolution over a pre-aggregated (x, y, cnt) relation — the
    entry point when counts already exist (a streaming windowed
    aggregation, a stored rollup, a snapshot change feed), mirroring
    hotspots.getis_ord_from_counts so streaming and batch heat surfaces
    share one code path."""
    dim = 1 << zoom
    w = binomial_kernel(radius)
    cells = cells.select("x", "y", F.col("cnt").cast("long").alias("cnt"))
    offsets = [
        (dx, dy, w[dx + radius] * w[dy + radius])
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)
    ]
    return (
        cells.select(
            "cnt",
            F.explode(
                F.filter(
                    F.array(
                        *[
                            F.struct(
                                (F.col("x") + F.lit(dx)).alias("tx"),
                                (F.col("y") + F.lit(dy)).alias("ty"),
                                F.lit(wt).cast("long").alias("w"),
                            )
                            for dx, dy, wt in offsets
                        ]
                    ),
                    lambda c: (c["tx"] >= 0)
                    & (c["tx"] < dim)
                    & (c["ty"] >= 0)
                    & (c["ty"] < dim),
                )
            ).alias("t"),
        )
        .groupBy(F.col("t.tx").alias("x"), F.col("t.ty").alias("y"))
        .agg(F.sum(F.col("cnt") * F.col("t.w")).cast("long").alias("density"))
    )


def stkde_heatmap(
    points: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str = "ts",
    zoom: int = 4,
    bin_micros: int = 30 * 86_400 * 1_000_000,
    radius: int = 2,
    t_radius: int = 1,
) -> DataFrame:
    """Space-time kernel density (the space-time-cube heat layer —
    ArcGIS Space Time Cube visualization / Brunsdon et al. 2007 STKDE),
    integer-exact like kde_heatmap: a separable 3-D binomial kernel
    wx * wy * wt convolved over per-(cell, time-bin) counts.

    Time bins are ABSOLUTE (epoch_micros div bin_micros — a fixed epoch,
    never the data min, so bin ids can't depend on scan order; the
    ST-DBSCAN anchoring rule).  Spatial targets clip to the grid; time
    targets do NOT clip — smoothing spills one bin past the data range
    at each end, which is the correct cube boundary behavior.

    100 TB shape: one slim (x, y, tbin) aggregation over the points,
    then a (2r+1)^2 * (2rt+1)-struct explode on the AGGREGATED relation
    and one re-aggregation — bounded by occupied cube cells, never
    points; everything int64."""
    from ..udfs import tile_x_expr, tile_y_expr

    dim = 1 << zoom
    # TIMESTAMP_NTZ epoch micros (session-tz-independent), then integer
    # `div`: non-negative operands make Spark's truncating div identical
    # to DuckDB's floor `//` (CLAUDE.md round-half-tie lesson).
    tb = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        f" div {int(bin_micros)}"
    )
    cells = points.groupBy(
        tb.alias("tbin"),
        tile_x_expr(F.col(lon_col), F.lit(zoom)).alias("x"),
        tile_y_expr(F.col(lat_col), F.lit(zoom)).alias("y"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    w = binomial_kernel(radius)
    wt = binomial_kernel(t_radius)
    offsets = [
        (dx, dy, dt, w[dx + radius] * w[dy + radius] * wt[dt + t_radius])
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)
        for dt in range(-t_radius, t_radius + 1)
    ]
    return (
        cells.select(
            "cnt",
            F.explode(
                F.filter(
                    F.array(
                        *[
                            F.struct(
                                (F.col("x") + F.lit(dx)).alias("tx"),
                                (F.col("y") + F.lit(dy)).alias("ty"),
                                (F.col("tbin") + F.lit(dt)).alias("tt"),
                                F.lit(wgt).cast("long").alias("w"),
                            )
                            for dx, dy, dt, wgt in offsets
                        ]
                    ),
                    lambda c: (c["tx"] >= 0)
                    & (c["tx"] < dim)
                    & (c["ty"] >= 0)
                    & (c["ty"] < dim),
                )
            ).alias("t"),
        )
        .groupBy(
            F.col("t.tx").alias("x"), F.col("t.ty").alias("y"),
            F.col("t.tt").alias("tbin"),
        )
        .agg(F.sum(F.col("cnt") * F.col("t.w")).cast("long").alias("density"))
    )
