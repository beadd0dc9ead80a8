"""Raster warp: affine scale/translate resampling onto a new tile grid.

The gdalwarp core case (also ArcGIS Resample / Project Raster with an
axis-aligned transform): every output pixel samples the source at
    s(o) = o * num / den + off
per axis, with BILINEAR interpolation — the one raster op the toolbox
still lacked (overview/overscale handle only power-of-two factors;
this handles arbitrary rational scales and sub-pixel offsets, the
re-gridding step of raster ingest and mosaic alignment).

Exactness contract: the transform is RATIONAL (num/den ints, offset in
1/256-pixel fixed point) and the bilinear kernel is pure int64 —
    s_fp  = (o * num * 256) div den + off_fp            (1/256 px)
    ix0   = min(s_fp div 256, in_px - 2),  f = s_fp - ix0 * 256
    v     = ((256-fx)(256-fy)v00 + fx(256-fy)v10
             + (256-fx)fy v01 + fx fy v11 + 32768) div 65536
(f in [0, 256]; s_fp clamped to the source extent first — GDAL edge
clamp).  Every step is floor division on non-negative ints, so the
DuckDB oracle replays it bit-for-bit on the analytic fixture.

Distributed shape: output tiles are a generated lattice; each computes
its source pixel span JVM-side and EXPLODES to the input tile keys it
needs (fan-in = O(scale) tiles, bounded); input tiles join by key and
applyInPandas assembles the per-output-tile mosaic (few/large groups —
the applyInPandas side of the tiny-group rule) and runs the vectorized
numpy kernel.  Payload crosses the shuffle ONCE, unavoidably — pixels
physically move between tiles, same as the overview roll-up; everything
else in the exchange is slim keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codecs import decode_image, encode_image


def _sfp_expr(o_expr: str, num: int, den: int, off_fp: int, max_fp: int) -> str:
    """SQL/Spark text for the clamped fixed-point source position."""
    return (
        f"least(greatest((({o_expr}) * {num * 256}) div {den} + {off_fp}, 0), {max_fp})"
    )


def raster_warp(
    tiles: DataFrame,
    in_tiles_x: int,
    in_tiles_y: int,
    out_tiles_x: int,
    out_tiles_y: int,
    num_x: int,
    den_x: int,
    off_x_fp: int,
    num_y: int,
    den_y: int,
    off_y_fp: int,
    tile_size: int = 256,
    payload: str = "bytes",
    band: int = 0,
    emit: str = "stats",
    fmt: str = "png",
) -> DataFrame:
    """Warp `tiles` (x, y, bytes — a complete in_tiles_x x in_tiles_y
    grid) onto an out_tiles_x x out_tiles_y output grid under the
    per-axis rational transform.  emit='stats' returns per-output-tile
    (x, y, n_px, sum_v, min_v, max_v); emit='tiles' returns re-encoded
    single-band tiles (x, y, bytes, fmt)."""
    ts = int(tile_size)
    in_w, in_h = in_tiles_x * ts, in_tiles_y * ts
    max_fx, max_fy = (in_w - 1) * 256, (in_h - 1) * 256
    spark = tiles.sparkSession
    grid = spark.range(out_tiles_x).select(F.col("id").alias("ox")).crossJoin(
        spark.range(out_tiles_y).select(F.col("id").alias("oy"))
    )
    # source pixel span of each output tile (monotone transform): first and
    # last output pixel map the extremes; +1 pixel for the bilinear neighbor
    lo_x = _sfp_expr(f"ox * {ts}", num_x, den_x, off_x_fp, max_fx)
    hi_x = _sfp_expr(f"ox * {ts} + {ts - 1}", num_x, den_x, off_x_fp, max_fx)
    lo_y = _sfp_expr(f"oy * {ts}", num_y, den_y, off_y_fp, max_fy)
    hi_y = _sfp_expr(f"oy * {ts} + {ts - 1}", num_y, den_y, off_y_fp, max_fy)
    spans = grid.select(
        "ox", "oy",
        F.expr(f"({lo_x}) div 256 div {ts}").alias("itx0"),
        F.expr(f"least(({hi_x}) div 256 + 1, {in_w - 1}) div {ts}").alias("itx1"),
        F.expr(f"({lo_y}) div 256 div {ts}").alias("ity0"),
        F.expr(f"least(({hi_y}) div 256 + 1, {in_h - 1}) div {ts}").alias("ity1"),
    )
    need = spans.select(
        "ox", "oy", "itx0", "ity0",
        F.explode(F.sequence("itx0", "itx1")).alias("itx"), "ity0", "ity1",
    ).select(
        "ox", "oy", "itx0", "ity0", "itx",
        F.explode(F.sequence("ity0", "ity1")).alias("ity"),
    )
    joined = need.join(
        tiles.select(
            F.col("x").alias("itx"), F.col("y").alias("ity"),
            F.col(payload).alias("in_bytes"),
        ),
        ["itx", "ity"],
    )

    if emit == "stats":
        out_schema = "x long, y long, n_px long, sum_v long, min_v long, max_v long"
    else:
        out_schema = "x long, y long, bytes binary, fmt string"

    def warp_one(pdf: pd.DataFrame) -> pd.DataFrame:
        ox, oy = int(pdf["ox"].iloc[0]), int(pdf["oy"].iloc[0])
        tx0, ty0 = int(pdf["itx0"].iloc[0]), int(pdf["ity0"].iloc[0])
        tx1, ty1 = int(pdf["itx"].max()), int(pdf["ity"].max())
        canvas = np.zeros(((ty1 - ty0 + 1) * ts, (tx1 - tx0 + 1) * ts), dtype=np.int64)
        for r in pdf.itertuples():
            img = decode_image(bytes(r.in_bytes))
            canvas[
                (int(r.ity) - ty0) * ts : (int(r.ity) - ty0 + 1) * ts,
                (int(r.itx) - tx0) * ts : (int(r.itx) - tx0 + 1) * ts,
            ] = img[..., band].astype(np.int64)
        o_px_x = np.arange(ox * ts, (ox + 1) * ts, dtype=np.int64)
        o_px_y = np.arange(oy * ts, (oy + 1) * ts, dtype=np.int64)
        sfx = np.clip((o_px_x * (num_x * 256)) // den_x + off_x_fp, 0, max_fx)
        sfy = np.clip((o_px_y * (num_y * 256)) // den_y + off_y_fp, 0, max_fy)
        ix0 = np.minimum(sfx // 256, in_w - 2)
        iy0 = np.minimum(sfy // 256, in_h - 2)
        fx = sfx - ix0 * 256
        fy = sfy - iy0 * 256
        cx0, cy0 = ix0 - tx0 * ts, iy0 - ty0 * ts
        v00 = canvas[np.ix_(cy0, cx0)]
        v10 = canvas[np.ix_(cy0, cx0 + 1)]
        v01 = canvas[np.ix_(cy0 + 1, cx0)]
        v11 = canvas[np.ix_(cy0 + 1, cx0 + 1)]
        wfx, wfy = fx[None, :], fy[:, None]
        v = (
            (256 - wfx) * (256 - wfy) * v00
            + wfx * (256 - wfy) * v10
            + (256 - wfx) * wfy * v01
            + wfx * wfy * v11
            + 32768
        ) // 65536
        if emit == "stats":
            return pd.DataFrame(
                {
                    "x": [ox], "y": [oy], "n_px": [int(v.size)],
                    "sum_v": [int(v.sum())],
                    "min_v": [int(v.min())], "max_v": [int(v.max())],
                }
            )
        img = v.astype(np.uint8)[..., None]
        return pd.DataFrame(
            {"x": [ox], "y": [oy], "bytes": [encode_image(img, fmt)], "fmt": [fmt]}
        )

    return joined.groupBy("ox", "oy").applyInPandas(warp_one, schema=out_schema)
