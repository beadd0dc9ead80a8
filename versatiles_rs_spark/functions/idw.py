"""Inverse-distance-weighted (IDW) gap filling over the tile grid.

IDW (Shepard 1968) is the standard GIS surface interpolator: the value at
an unsampled location is the distance-weighted mean of nearby samples,
w_i = 1/d_i^p. Here it fills the EMPTY cells of an event-count surface
from their occupied ring-2 neighbors — the "no data here, but the
neighborhood says ~x" layer under every smoothed choropleth.

Exact-rational determinism trick (the repo's integer-core rule): with
power p = 2 on the ring-2 grid, the only possible squared distances are
d^2 in {1, 2, 4, 5, 8}, and lcm(1,2,4,5,8) = 40 — so scaling every weight
by 40 makes them EXACT integers: w(d^2) = 40/d^2 in {40, 20, 10, 8, 5}.
The interpolation

    est = sum_i w_i * x_i  /  sum_i w_i

is then an int64 ratio; we emit the exact numerator/denominator and the
milli-precision floor quotient (num * 1000) div den — non-negative
operands, so Spark `div` == DuckDB `//` (CLAUDE.md half-tie lesson: never
round() a quotient in an oracle-paired query). No floats anywhere.

100 TB shape: same envelope as KDE/Gi* — one slim (cell, count)
aggregation over the point table, a 24-way explode on the AGGREGATED cell
relation, one anti-join against the occupied set. Nothing wider than the
occupied-cell count ever shuffles. Documented bound:
max_cell_count * 40 * 24 * 1000 < 2^63, i.e. ~10^13 points per cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hotspots import cell_counts

#: ring-2 offsets (excluding the center) with exact lcm-scaled weights
OFFSETS = [
    (dx, dy, 40 // (dx * dx + dy * dy))
    for dx in (-2, -1, 0, 1, 2)
    for dy in (-2, -1, 0, 1, 2)
    if (dx, dy) != (0, 0)
]


def idw_fill(
    points: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    zoom: int = 6,
) -> DataFrame:
    """(x, y, num, den, est_milli) for every EMPTY cell within ring 2 of
    at least one occupied cell: num = sum w*cnt, den = sum w over the
    occupied ring-2 neighbors (exact int64), est_milli = the interpolated
    count at 1/1000 precision via non-negative floor division."""
    dim = 1 << zoom
    cells = cell_counts(points, lon_col, lat_col, zoom).cache()
    contrib = (
        cells.select(
            "cnt",
            F.explode(
                F.filter(
                    F.array(
                        *[
                            F.struct(
                                (F.col("x") + F.lit(dx)).alias("tx"),
                                (F.col("y") + F.lit(dy)).alias("ty"),
                                F.lit(w).cast("long").alias("w"),
                            )
                            for dx, dy, w in OFFSETS
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
        .agg(
            F.sum(F.col("t.w") * F.col("cnt")).alias("num"),
            F.sum(F.col("t.w")).alias("den"),
        )
    )
    empty = contrib.join(cells.select("x", "y"), on=["x", "y"], how="left_anti")
    return empty.select(
        "x",
        "y",
        F.col("num").cast("long").alias("num"),
        F.col("den").cast("long").alias("den"),
        F.expr("(num * 1000) div den").cast("long").alias("est_milli"),
    )
