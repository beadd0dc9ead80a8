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
