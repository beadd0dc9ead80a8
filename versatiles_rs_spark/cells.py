"""Hierarchical cell indexing (H3/S2 role).

The north rule calls for "H3/S2 cell indexes". No H3/S2 library ships in this
container, so the engine's canonical cell index is its own web-mercator tile
grid + Hilbert id (equivalent hierarchical-cover semantics: fixed-resolution
cells, parent/child by bit shift, k-ring by neighbor offsets). When the `h3`
package IS available the same API emits real H3 cells — the import is gated,
nothing else changes.

API:
- with_cell_ids(df, lon, lat, res):  adds `cell` (long) at a resolution
- cell_kring_expr(res, ring):        neighbor-cell explode for kNN/PIP probes
  (tile grid: (2r+1)^2 offsets; h3: grid_disk)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .udfs import tile_x_expr, tile_y_expr

try:  # optional — not present in this environment
    import h3 as _h3  # type: ignore

    HAS_H3 = True
except ImportError:
    _h3 = None
    HAS_H3 = False


def tile_cell_expr(lon: Column, lat: Column, res: int) -> Column:
    """Pack (x, y) at zoom `res` into one long: cell = (x << res) | y.
    Parent cell = cell of res-1 via coordinate shift — same hierarchy
    semantics as H3 parent/child."""
    x = tile_x_expr(lon, F.lit(res))
    y = tile_y_expr(lat, F.lit(res))
    return (F.shiftleft(x, res) + y).cast("long")


def with_cell_ids(
    df: DataFrame, lon: str = "lon", lat: str = "lat", res: int = 8, out: str = "cell",
    use_h3: bool | None = None, kind: str | None = None,
) -> DataFrame:
    """Attach a hierarchical cell id column.

    kind: "tile" (default; pure JVM expressions), "s2" (REAL S2 cell ids —
    vectorized numpy port of the public s2geometry algorithm, s2.py),
    "hex7" (aperture-7 icosahedral hexagonal index — H3's grid structure
    with a documented engine-specific orientation, hex7.py), or "h3"
    (import-gated on the h3 package: bit-exact H3 ids need Uber's published
    orientation tables, which can't be fetched or verified offline)."""
    if kind is None:
        kind = "h3" if (use_h3 or (use_h3 is None and HAS_H3)) else "tile"
    if kind == "h3":
        if not HAS_H3:
            raise NotImplementedError("h3 package not available in this environment")
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import LongType

        @pandas_udf(LongType())
        def h3_udf(lons: pd.Series, lats: pd.Series) -> pd.Series:
            return pd.Series(
                [int(_h3.latlng_to_cell(la, lo, res), 16) if isinstance(_h3.latlng_to_cell(la, lo, res), str)
                 else int(_h3.latlng_to_cell(la, lo, res))
                 for lo, la in zip(lons, lats)]
            )

        return df.withColumn(out, h3_udf(F.col(lon), F.col(lat)))
    if kind == "s2":
        from .s2 import s2_cell_udf

        return df.withColumn(out, s2_cell_udf(res)(F.col(lon), F.col(lat)))
    if kind == "hex7":
        from .hex7 import hex7_cell_udf

        return df.withColumn(out, hex7_cell_udf(res)(F.col(lon), F.col(lat)))
    return df.withColumn(out, tile_cell_expr(F.col(lon), F.col(lat), res))


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_quant(precision: int) -> tuple[int, int]:
    """(lon_bits, lat_bits) for a `precision`-char geohash: lon takes the
    even interleave positions starting at the MSB, so it gets the extra bit
    when 5*precision is odd."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    return lon_bits, total - lon_bits


def geohash_expr(lon: Column, lat: Column, precision: int = 6) -> Column:
    """Classic base-32 geohash (Niemeyer) of (lon, lat), `precision` chars —
    the third cell system next to tile/S2/hex7, included because geohash
    prefixes are the common join key for externally-produced datasets.

    Pure JVM column expressions: quantize each axis to its bit budget,
    interleave bits lon-first (unrolled literal shifts — 5*precision
    terms), then index the base-32 alphabet per 5-bit group. No UDF, stays
    in WholeStageCodegen; the identical arithmetic is emitted as ANSI SQL
    by geohash_sql for the DuckDB oracle."""
    lon_bits, lat_bits = _geohash_quant(precision)
    total = lon_bits + lat_bits
    lonq = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))).cast("long"),
        F.lit((1 << lon_bits) - 1),
    )
    latq = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))).cast("long"),
        F.lit((1 << lat_bits) - 1),
    )
    v = F.lit(0).cast("long")
    for j in range(lon_bits):
        v = v + F.shiftleft(F.shiftright(lonq, lon_bits - 1 - j).bitwiseAND(F.lit(1)), total - 1 - 2 * j)
    for j in range(lat_bits):
        v = v + F.shiftleft(F.shiftright(latq, lat_bits - 1 - j).bitwiseAND(F.lit(1)), total - 2 - 2 * j)
    chars = [
        F.substring(
            F.lit(_GEOHASH32),
            (F.shiftright(v, 5 * (precision - 1 - i)).bitwiseAND(F.lit(31)) + F.lit(1)).cast("int"),
            1,
        )
        for i in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql(lon_sql: str, lat_sql: str, precision: int = 6) -> str:
    """The identical geohash arithmetic as an ANSI-SQL scalar expression
    (DuckDB oracle counterpart of geohash_expr — same op order so the IEEE
    float quantization is bit-identical)."""
    lon_bits, lat_bits = _geohash_quant(precision)
    total = lon_bits + lat_bits
    lonq = (
        f"least(CAST(floor((({lon_sql}) + 180.0) / 360.0 * {float(1 << lon_bits)}) AS BIGINT),"
        f" {(1 << lon_bits) - 1})"
    )
    latq = (
        f"least(CAST(floor((({lat_sql}) + 90.0) / 180.0 * {float(1 << lat_bits)}) AS BIGINT),"
        f" {(1 << lat_bits) - 1})"
    )
    terms = [
        f"(((lonq >> {lon_bits - 1 - j}) & 1) << {total - 1 - 2 * j})" for j in range(lon_bits)
    ] + [
        f"(((latq >> {lat_bits - 1 - j}) & 1) << {total - 2 - 2 * j})" for j in range(lat_bits)
    ]
    chars = "||".join(
        f"substring('{_GEOHASH32}', CAST(((v >> {5 * (precision - 1 - i)}) & 31) + 1 AS INTEGER), 1)"
        for i in range(precision)
    )
    return (
        f"(SELECT {chars} FROM (SELECT {' + '.join(terms)} AS v"
        f" FROM (SELECT {lonq} AS lonq, {latq} AS latq)))"
    )


def cell_parent_expr(cell: Column, res: int) -> Column:
    """Parent cell at res-1 (tile-grid packing): unpack, shift, repack."""
    x = F.shiftright(cell, res)
    y = cell - F.shiftleft(x, res)
    return (F.shiftleft(F.shiftright(x, 1), res - 1) + F.shiftright(y, 1)).cast("long")


def kring_cells(df: DataFrame, cell: str = "cell", res: int = 8, ring: int = 1) -> DataFrame:
    """Explode each row into its (2r+1)^2 ring cells (the H3 grid_disk
    analog) — the probe side of cell-join kNN."""
    x = F.shiftright(F.col(cell), res)
    y = F.col(cell) - F.shiftleft(x, res)
    n = F.lit(1 << res)
    offsets = [
        (dx, dy) for dx in range(-ring, ring + 1) for dy in range(-ring, ring + 1)
    ]
    off = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offsets])
    out = (
        df.withColumn("_o", F.explode(off))
        .withColumn("_nx", F.pmod(x + F.col("_o.dx"), n))
        .withColumn("_ny", y + F.col("_o.dy"))
        .filter((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .withColumn(cell, (F.shiftleft(F.col("_nx"), res) + F.col("_ny")).cast("long"))
        .drop("_o", "_nx", "_ny")
    )
    return out
