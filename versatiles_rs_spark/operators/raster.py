"""Raster payload operators: levels, flatten, format re-encode, overscale,
and the pyramid overview roll-up.

All kernels are numpy over decoded uint8 arrays, applied Arrow-batched
(mapInPandas / applyInPandas) — the engine's columnar counterpart of the
reference's per-tile Rust ops.

Parity sources (/root/reference/):
- levels math + goldens: versatiles_pipeline/src/operations/raster/raster_levels.rs:61-73,118-123
- flatten integer blend: versatiles_image/src/traits/operation.rs:128-151
- per-zoom quality re-encode: .../raster/raster_format.rs:115-165
- overscale crop+upscale: .../raster/raster_overscale.rs:104-123
- overview 2x2 mosaic + box downscale: .../raster/raster_overview.rs:35-172,
  operation.rs:114-125
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codecs import decode_image, encode_image
from . import register_operator


def levels_kernel(img: np.ndarray, brightness: float, contrast: float, gamma: float) -> np.ndarray:
    """v' = clamp(round((((v-127.5)*c/255 + 0.5 + b/255))^gamma * 255)).

    Applies to color channels only; alpha passes through (LumaA/RGBA keep
    their last channel — raster_levels.rs golden cases :110-116).
    """
    # all-f32 arithmetic + round-half-away-from-zero to match the Rust kernel
    # bit-for-bit (raster_levels.rs computes in f32 and uses f32::round)
    c = np.float32(contrast) / np.float32(255.0)
    b = np.float32(brightness) / np.float32(255.0)
    out = img.astype(np.float32).copy()
    nch = img.shape[2]
    color_ch = nch - 1 if nch in (2, 4) else nch
    v = (out[..., :color_ch] - np.float32(127.5)) * c + np.float32(0.5) + b
    with np.errstate(invalid="ignore"):
        v = np.power(np.maximum(v, np.float32(0.0)), np.float32(gamma), dtype=np.float32)
        v = v * np.float32(255.0)
    out[..., :color_ch] = v
    out = np.clip(out, 0, 255)
    return np.floor(out + np.float32(0.5)).astype(np.uint8)


def flatten_kernel(img: np.ndarray, color: tuple[int, int, int]) -> np.ndarray:
    """Alpha-composite RGBA onto an opaque background color with the
    reference's integer math (p*a + c*(255-a) + 127) / 255
    (operation.rs:128-151); opaque pixels copied verbatim."""
    if img.shape[2] != 4:
        return img
    a = img[..., 3:4].astype(np.uint16)
    b = 255 - a
    c = np.array(color, dtype=np.uint16)
    rgb = ((img[..., :3].astype(np.uint16) * a) + c * b + 127) // 255
    return rgb.astype(np.uint8)


def downscale2_kernel(img: np.ndarray) -> np.ndarray:
    """Box-filter 2x downscale (operation.rs:114-125, FilterType::Box):
    mean of each 2x2 block, round-half-up like the integer pipeline."""
    h, w, ch = img.shape
    blocks = img.reshape(h // 2, 2, w // 2, 2, ch).astype(np.uint16)
    return ((blocks.sum(axis=(1, 3)) + 2) // 4).astype(np.uint8)


def overscale_kernel(parent: np.ndarray, dx: int, dy: int, scale: int) -> np.ndarray:
    """Child tile from parent: crop quadrant (dx, dy) of 1/scale size and
    nearest-neighbor upscale back to tile size (raster_overscale.rs:104-123)."""
    h, w, _ = parent.shape
    cw, ch_ = w // scale, h // scale
    crop = parent[dy * ch_ : (dy + 1) * ch_, dx * cw : (dx + 1) * cw]
    return np.repeat(np.repeat(crop, scale, axis=0), scale, axis=1)


def mosaic4_kernel(children: dict[tuple[int, int], np.ndarray], tile_size: int) -> np.ndarray:
    """Parent tile from up to 4 children: each child box-downscaled 2x and
    placed in its quadrant (raster_overview.rs:136-166); missing children
    leave transparent/zero quadrants."""
    sample = next(iter(children.values()))
    ch = sample.shape[2]
    half = tile_size // 2
    out = np.zeros((tile_size, tile_size, ch), dtype=np.uint8)
    for (qx, qy), img in children.items():
        out[qy * half : (qy + 1) * half, qx * half : (qx + 1) * half] = downscale2_kernel(img)
    return out


# ---------------------------------------------------------------------------
# DataFrame operators
# ---------------------------------------------------------------------------


def _map_payload(df: DataFrame, fn, payload: str = "bytes", fmt_col: str = "fmt") -> DataFrame:
    """Apply decoded-pixel kernel fn(img, row) -> img per tile, re-encoding in
    the row's own format. Arrow-batched; decode once per stage
    (lazy-decode parity: tile.rs:58-65)."""
    schema = df.schema

    def run(batches):
        for pdf in batches:
            out = []
            for blob, fmt in zip(pdf[payload], pdf[fmt_col]):
                img = decode_image(bytes(blob))
                img = fn(img)
                out.append(encode_image(img, fmt))
            pdf = pdf.copy()
            pdf[payload] = pd.Series(out, index=pdf.index)
            yield pdf

    return df.mapInPandas(run, schema=schema)


@register_operator("raster_levels")
def raster_levels(
    df: DataFrame, brightness: float = 0.0, contrast: float = 255.0, gamma: float = 1.0, **kw
) -> DataFrame:
    return _map_payload(df, lambda img: levels_kernel(img, brightness, contrast, gamma), **kw)


@register_operator("raster_flatten")
def raster_flatten(df: DataFrame, color=(255, 255, 255), **kw) -> DataFrame:
    return _map_payload(df, lambda img: flatten_kernel(img, color), **kw)


def parse_quality_table(spec: str | int) -> dict:
    """Per-zoom quality spec "0-9:90,10-14:80" or a single int
    (raster_format.rs:115-133 parses the same shape from VPL args)."""
    if isinstance(spec, int):
        return {"default": spec}
    table = {"default": 85}
    for part in str(spec).split(","):
        rng, q = part.split(":")
        if "-" in rng:
            lo, hi = rng.split("-")
            for z in range(int(lo), int(hi) + 1):
                table[z] = int(q)
        else:
            table[int(rng)] = int(q)
    return table


@register_operator("raster_format")
def raster_format(
    df: DataFrame,
    target_fmt: str = "png",
    quality: str | int = 85,
    payload: str = "bytes",
    fmt_col: str = "fmt",
    z_col: str = "z",
) -> DataFrame:
    """Re-encode payload into target format with per-zoom quality
    (raster_format.rs:155-165)."""
    table = parse_quality_table(quality)

    def run(batches):
        for pdf in batches:
            out = []
            for blob, z in zip(pdf[payload], pdf[z_col]):
                img = decode_image(bytes(blob))
                q = table.get(int(z), table["default"])
                out.append(encode_image(img, target_fmt, quality=q))
            pdf = pdf.copy()
            pdf[payload] = pd.Series(out, index=pdf.index)
            pdf[fmt_col] = target_fmt
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


@register_operator("raster_palette")
def raster_palette(
    df: DataFrame,
    n_colors: int = 256,
    payload: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Quantize tiles to palette PNG8 (the pngquant / TileMill "PNG8
    tiles" serving optimization — 2-4x smaller payloads at map-tile
    color counts): deterministic median-cut (codecs.median_cut_palette),
    PLTE+tRNS encode, ONE fused Arrow pass (decode-quantize-encode;
    payload bytes cross the Arrow boundary once).  fmt stays "png" —
    PNG8 is plain PNG to every client."""
    n_colors = int(n_colors)

    def run(batches):
        from ..codecs import encode_png8

        for pdf in batches:
            out = []
            for blob in pdf[payload]:
                img = decode_image(bytes(blob))
                out.append(encode_png8(img, n_colors))
            pdf = pdf.copy()
            pdf[payload] = pd.Series(out, index=pdf.index)
            pdf[fmt_col] = "png"
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


@register_operator("raster_overscale")
def raster_overscale(
    df: DataFrame, from_zoom: int, to_zoom: int, payload: str = "bytes", fmt_col: str = "fmt"
) -> DataFrame:
    """Synthesize zoom `to_zoom` tiles by upscaling crops of their `from_zoom`
    ancestors (raster_overscale.rs:104-123). Explodes each parent into its
    4^dz descendants — pure DataFrame explode + per-row numpy crop."""
    dz = to_zoom - from_zoom
    assert dz >= 1
    scale = 1 << dz
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dy in range(scale)
            for dx in range(scale)
        ]
    )
    exploded = (
        df.withColumn("o", F.explode(offsets))
        .withColumn("cz", F.lit(to_zoom).cast("int"))
        .withColumn("cx", F.col("x") * scale + F.col("o.dx"))
        .withColumn("cy", F.col("y") * scale + F.col("o.dy"))
    )

    cols = [c for c in df.columns if c not in ("z", "x", "y")]
    out_schema = (
        "z int, x long, y long, "
        + ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name in cols)
    )

    def run(batches):
        for pdf in batches:
            imgs = []
            for blob, fmt, dx, dy in zip(
                pdf[payload], pdf[fmt_col], pdf["o"].map(lambda o: o["dx"]), pdf["o"].map(lambda o: o["dy"])
            ):
                img = decode_image(bytes(blob))
                imgs.append(encode_image(overscale_kernel(img, int(dx), int(dy), scale), fmt))
            out = pdf[["cz", "cx", "cy"] + [c for c in cols if c != payload]].rename(
                columns={"cz": "z", "cx": "x", "cy": "y"}
            )
            out[payload] = imgs
            yield out[["z", "x", "y"] + cols]

    return exploded.mapInPandas(run, schema=out_schema)


def build_overview_level(
    df: DataFrame, tile_size: int, payload: str = "bytes", fmt: str = "png"
) -> DataFrame:
    """One pyramid roll-up step: tiles at level z -> parents at z-1.

    groupBy(parent) gathers <=4 children; the grouped-map kernel downscales
    each 2x and mosaics quadrants (raster_overview.rs:114-172). The shuffle
    key (z-1, x>>1, y>>1) is computed JVM-side; partial data (missing
    children) produces transparent quadrants like the reference's cache
    rebuild path.
    """
    parentd = (
        df.withColumn("pz", (F.col("z") - 1).cast("int"))
        .withColumn("px", F.shiftright("x", 1))
        .withColumn("py", F.shiftright("y", 1))
        .withColumn("qx", (F.col("x") % 2).cast("int"))
        .withColumn("qy", (F.col("y") % 2).cast("int"))
    )
    out_schema = f"z int, x long, y long, {payload} binary, fmt string, n_children int"

    def mosaic(pdf: pd.DataFrame) -> pd.DataFrame:
        children = {
            (int(r.qx), int(r.qy)): decode_image(bytes(r.child_bytes))
            for r in pdf.itertuples()
        }
        img = mosaic4_kernel(children, tile_size)
        return pd.DataFrame(
            {
                "z": [int(pdf["pz"].iloc[0])],
                "x": [int(pdf["px"].iloc[0])],
                "y": [int(pdf["py"].iloc[0])],
                payload: [encode_image(img, fmt)],
                "fmt": [fmt],
                "n_children": [len(pdf)],
            }
        )

    sel = parentd.select(
        "pz", "px", "py", "qx", "qy", F.col(payload).alias("child_bytes")
    )
    return sel.groupBy("pz", "px", "py").applyInPandas(mosaic, schema=out_schema)


def build_pyramid(
    df: DataFrame,
    z_max: int,
    z_min: int = 0,
    tile_size: int = 64,
    payload: str = "bytes",
    fmt: str = "png",
    checkpoint_fn=None,
) -> dict[int, DataFrame]:
    """Full overview pyramid z_max -> z_min, one level per iteration
    (driver-side loop like the reference's DepthFirst descent,
    raster_overview.rs:35-172). `checkpoint_fn(level, df) -> DataFrame` lets
    the caller commit each level (the resume checkpoint required by the
    north rule — see sinks.checkpoint.LevelCheckpointer)."""
    levels = {z_max: df}
    cur = df
    for z in range(z_max - 1, z_min - 1, -1):
        cur = build_overview_level(cur, tile_size, payload=payload, fmt=fmt).drop("n_children")
        if checkpoint_fn is not None:
            cur = checkpoint_fn(z, cur)
        levels[z] = cur
    return levels


def hillshade_kernel(
    heights: np.ndarray,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    cellsize: float = 1.0,
    z_factor: float = 1.0,
) -> np.ndarray:
    """Horn (1981) hillshade over an elevation grid -> uint8 (H-2, W-2).

    Gradients from the 3x3 Horn stencil; illumination = cos(zenith)cos(slope)
    + sin(zenith)sin(slope)cos(azimuth - aspect), clamped to [0, 1] and
    scaled to 255 — the formula GDAL's gdaldem uses.  The 1-pixel border is
    dropped (no neighbor); tile pipelines render with 1px overlap buffers."""
    h = heights.astype(np.float64) * z_factor
    dzdx = (
        (h[:-2, 2:] + 2 * h[1:-1, 2:] + h[2:, 2:])
        - (h[:-2, :-2] + 2 * h[1:-1, :-2] + h[2:, :-2])
    ) / (8.0 * cellsize)
    dzdy = (
        (h[2:, :-2] + 2 * h[2:, 1:-1] + h[2:, 2:])
        - (h[:-2, :-2] + 2 * h[:-2, 1:-1] + h[:-2, 2:])
    ) / (8.0 * cellsize)
    slope = np.arctan(np.hypot(dzdx, dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    az = np.deg2rad(360.0 - azimuth_deg + 90.0)
    zen = np.deg2rad(90.0 - altitude_deg)
    shade = np.cos(zen) * np.cos(slope) + np.sin(zen) * np.sin(slope) * np.cos(az - aspect)
    return np.clip(shade * 255.0, 0, 255).astype(np.uint8)


def mdow_hillshade_kernel(
    heights: np.ndarray,
    altitude_deg: float = 45.0,
    cellsize: float = 1.0,
    z_factor: float = 1.0,
) -> np.ndarray:
    """Multidirectional (MDOW, Mark 1992) hillshade -> uint8 (H-2, W-2):
    four Horn-kernel lamps at azimuths 225/270/315/360, each clamped then
    weighted by sin^2(aspect - azimuth).  The four weights always sum to
    2 exactly (the sin^2 pair identity holds for EVERY aspect, flat
    included), so the blend never divides by zero — gdaldem hillshade
    -multidirectional semantics."""
    h = heights.astype(np.float64) * z_factor
    dzdx = (
        (h[:-2, 2:] + 2 * h[1:-1, 2:] + h[2:, 2:])
        - (h[:-2, :-2] + 2 * h[1:-1, :-2] + h[2:, :-2])
    ) / (8.0 * cellsize)
    dzdy = (
        (h[2:, :-2] + 2 * h[2:, 1:-1] + h[2:, 2:])
        - (h[:-2, :-2] + 2 * h[:-2, 1:-1] + h[:-2, 2:])
    ) / (8.0 * cellsize)
    slope = np.arctan(np.hypot(dzdx, dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    zen = np.deg2rad(90.0 - altitude_deg)
    acc = np.zeros_like(slope)
    for az_deg in (225.0, 270.0, 315.0, 360.0):
        az = np.deg2rad(360.0 - az_deg + 90.0)
        shade = np.cos(zen) * np.cos(slope) + np.sin(zen) * np.sin(slope) * np.cos(az - aspect)
        acc += np.sin(az - aspect) ** 2 * np.clip(shade, 0.0, None)
    return np.clip(acc / 2.0 * 255.0, 0, 255).astype(np.uint8)


def slope_kernel(heights: np.ndarray, cellsize: float = 1.0, z_factor: float = 1.0) -> np.ndarray:
    """Slope in degrees (Horn stencil), (H-2, W-2) float64."""
    h = heights.astype(np.float64) * z_factor
    dzdx = (
        (h[:-2, 2:] + 2 * h[1:-1, 2:] + h[2:, 2:])
        - (h[:-2, :-2] + 2 * h[1:-1, :-2] + h[2:, :-2])
    ) / (8.0 * cellsize)
    dzdy = (
        (h[2:, :-2] + 2 * h[2:, 1:-1] + h[2:, 2:])
        - (h[:-2, :-2] + 2 * h[:-2, 1:-1] + h[:-2, 2:])
    ) / (8.0 * cellsize)
    return np.rad2deg(np.arctan(np.hypot(dzdx, dzdy)))


def dem_hillshade(
    df: DataFrame,
    schema: str = "mapbox",
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    cellsize: float = 1.0,
    payload: str = "bytes",
    out_fmt: str = "png",
    multidirectional: bool = False,
) -> DataFrame:
    """DEM tile table -> hillshade tile table in ONE fused Arrow pass:
    decode the RGB-encoded elevations (codecs.decode_dem), shade with the
    Horn kernel, re-encode grayscale PNG.  gdaldem-hillshade semantics,
    Spark-shaped: payload crosses Arrow once, no shuffle at all."""
    from ..codecs import decode_dem, decode_image, encode_image

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for blob in pdf[payload]:
                rgb = decode_image(bytes(blob))[:, :, :3]
                heights = decode_dem(rgb, schema=schema)
                if multidirectional:
                    sh = mdow_hillshade_kernel(
                        heights, altitude_deg=altitude_deg, cellsize=cellsize,
                    )
                else:
                    sh = hillshade_kernel(
                        heights, azimuth_deg=azimuth_deg, altitude_deg=altitude_deg,
                        cellsize=cellsize,
                    )
                out.append(encode_image(np.repeat(sh[:, :, None], 3, axis=2), out_fmt))
            pdf = pdf.copy()
            pdf[payload] = out
            pdf["fmt"] = out_fmt
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


def color_relief_kernel(
    heights: np.ndarray, stops: list[tuple[float, int, int, int]]
) -> np.ndarray:
    """gdaldem color-relief ramp (apps/gdaldem_lib.cpp ColorAssociation
    semantics, default interpolation mode): linear RGB interpolation
    between ascending (elevation, r, g, b) stops, clamped to the first /
    last color outside the table.  (H, W) heights -> (H, W, 3) uint8."""
    st = sorted(stops)
    vs = np.array([s[0] for s in st], dtype=np.float64)
    cols = np.array([[s[1], s[2], s[3]] for s in st], dtype=np.float64)
    h = heights.astype(np.float64)
    idx = np.searchsorted(vs, h, side="right") - 1
    lo = np.clip(idx, 0, vs.size - 1)
    hi = np.clip(idx + 1, 0, vs.size - 1)
    span = np.where(vs[hi] > vs[lo], vs[hi] - vs[lo], 1.0)
    t = np.clip((h - vs[lo]) / span, 0.0, 1.0)
    rgb = cols[lo] * (1.0 - t[..., None]) + cols[hi] * t[..., None]
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def dem_color_relief(
    df: DataFrame,
    stops: list[tuple[float, int, int, int]],
    schema: str = "mapbox",
    payload: str = "bytes",
    out_fmt: str = "png",
) -> DataFrame:
    """DEM tile table -> color-relief tile table (the gdaldem
    color-relief mode) in ONE fused Arrow pass: decode RGB-encoded
    elevations, ramp-map, re-encode — payload crosses Arrow once, no
    shuffle, same plan shape as dem_hillshade."""
    if not stops:
        raise ValueError("color relief needs at least one (value, r, g, b) stop")
    from ..codecs import decode_dem, decode_image, encode_image

    def run(batches):
        import pandas as pd  # noqa: F401  (batches are pandas already)

        for pdf in batches:
            out = []
            for blob in pdf[payload]:
                rgb = decode_image(bytes(blob))[:, :, :3]
                heights = decode_dem(rgb, schema=schema)
                out.append(encode_image(color_relief_kernel(heights, stops), out_fmt))
            pdf = pdf.copy()
            pdf[payload] = out
            pdf["fmt"] = out_fmt
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


def incremental_pyramid_update(
    levels_old: dict[int, DataFrame],
    changed: DataFrame,
    z_max: int,
    z_min: int = 0,
    tile_size: int = 64,
    payload: str = "bytes",
    fmt: str = "png",
    broadcast_dirty: bool = True,
    checkpoint_fn=None,
) -> dict[int, DataFrame]:
    """Dirty-propagation pyramid refresh: recompute ONLY the ancestors of
    upserted base tiles instead of rebuilding the pyramid.

    `checkpoint_fn(z, delta) -> DataFrame` (same contract as
    build_pyramid) commits each level's delta and returns the read-back
    relation — REQUIRED for multi-level runs with per-level sinks, or the
    lazy lineage re-executes every upstream mosaic once per level commit
    (O(levels^2) decode work, measured 4x on the refresh job).

    `levels_old` is the committed pyramid (z -> tile DataFrame, e.g. per
    level SnapshotTable.read()); `changed` holds the new/replaced tiles at
    z_max.  Per level going up: the dirty parent set is the changed tiles'
    parents; their sibling children are fetched from the OLD level (semi
    join), changed tiles override old at equal keys (anti join), and one
    build_overview_level mosaics the union.  Returns z -> per-level DELTA
    (changed tiles only) — commit each as a SnapshotTable append/overwrite
    or LevelCheckpointer level, and merge-on-read stays trivial because a
    parent key appears in at most one delta.

    Work/shuffle is O(|changed| x levels), not O(pyramid): at 100 TB a
    0.1% daily refresh touches ~0.4% of tiles (4 ancestors per change).
    The dirty-key and changed-key relations are broadcast by default (the
    delta is the small side by contract — a refresh, not a rebuild); pass
    broadcast_dirty=False for rebuild-sized deltas and the joins fall back
    to hash shuffles of slim keys (old payload columns still only shuffle
    in the mosaic groupBy, same as a full build)."""
    maybe_b = F.broadcast if broadcast_dirty else (lambda d: d)
    cur = changed if checkpoint_fn is None else checkpoint_fn(z_max, changed)
    deltas = {z_max: cur}
    for z in range(z_max - 1, z_min - 1, -1):
        old = levels_old[z + 1]
        dirty = maybe_b(
            cur.select(
                F.shiftright("x", 1).alias("_px"), F.shiftright("y", 1).alias("_py")
            ).distinct()
        )
        siblings = (
            old.withColumn("_px", F.shiftright("x", 1))
            .withColumn("_py", F.shiftright("y", 1))
            .join(dirty, on=["_px", "_py"], how="left_semi")
            .drop("_px", "_py")
        )
        replaced = maybe_b(cur.select("z", "x", "y"))
        kids = cur.unionByName(
            siblings.join(replaced, on=["z", "x", "y"], how="left_anti")
        )
        cur = build_overview_level(kids, tile_size, payload=payload, fmt=fmt).drop(
            "n_children"
        )
        if checkpoint_fn is not None:
            cur = checkpoint_fn(z, cur)
        deltas[z] = cur
    return deltas


_ZONAL_MAX_ZONES = 200_000  # broadcast guard: ~5 ints/zone -> a few MB


def zonal_stats(
    tiles: DataFrame,
    zones: DataFrame,
    tile_size: int = 256,
    payload: str = "bytes",
    band: int = 0,
    zone_id: str = "zone_id",
) -> DataFrame:
    """Zonal statistics: aggregate raster pixel values per vector zone —
    the raster->vector reduction (GDAL's zonal-stats / rasterio
    rasterstats role, absent from the reference toolbox).

    `tiles`: (x, y, bytes) single-zoom raster tiles; `zones`:
    (zone_id, x0, y0, x1, y1) half-open rectangles in GLOBAL PIXEL
    coordinates of that zoom.

    100 TB shape: zones are a dimension table (size-guarded driver
    collect + SparkContext broadcast, like the PIP polygon side); each
    tile is decoded ONCE in a single Arrow crossing and emits only slim
    (zone_id, partial sum/count/min/max) rows — payload bytes never enter
    a join or shuffle, and the final aggregation moves O(zones x
    touched-tiles) integers. Skewed giant zones are inherently fine: their
    partials are computed tile-locally and combine associatively."""
    n_zones = zones.count()
    if n_zones > _ZONAL_MAX_ZONES:
        raise ValueError(
            f"zonal_stats broadcasts the zone table; {n_zones} zones exceeds "
            f"the {_ZONAL_MAX_ZONES} guard — tile the zones or use a PIP join"
        )
    zrows = zones.select(zone_id, "x0", "y0", "x1", "y1").collect()
    zid = np.array([r[0] for r in zrows], dtype=np.int64)
    zx0 = np.array([r[1] for r in zrows], dtype=np.int64)
    zy0 = np.array([r[2] for r in zrows], dtype=np.int64)
    zx1 = np.array([r[3] for r in zrows], dtype=np.int64)
    zy1 = np.array([r[4] for r in zrows], dtype=np.int64)
    bc = tiles.sparkSession.sparkContext.broadcast((zid, zx0, zy0, zx1, zy1))
    ts = int(tile_size)

    def run(batches):
        izid, ix0, iy0, ix1, iy1 = bc.value
        for pdf in batches:
            out = {"zone_id": [], "psum": [], "pcount": [], "pmin": [], "pmax": []}
            for x, y, blob in zip(pdf["x"], pdf["y"], pdf[payload]):
                tx0, ty0 = int(x) * ts, int(y) * ts
                hit = np.nonzero(
                    (ix0 < tx0 + ts) & (ix1 > tx0) & (iy0 < ty0 + ts) & (iy1 > ty0)
                )[0]
                if hit.size == 0:
                    continue
                img = decode_image(bytes(blob))
                v = img[..., band].astype(np.int64)
                for j in hit:
                    cx0, cx1 = max(int(ix0[j]) - tx0, 0), min(int(ix1[j]) - tx0, ts)
                    cy0, cy1 = max(int(iy0[j]) - ty0, 0), min(int(iy1[j]) - ty0, ts)
                    win = v[cy0:cy1, cx0:cx1]
                    out["zone_id"].append(int(izid[j]))
                    out["psum"].append(int(win.sum()))
                    out["pcount"].append(win.size)
                    out["pmin"].append(int(win.min()))
                    out["pmax"].append(int(win.max()))
            yield pd.DataFrame(out)

    partials = tiles.mapInPandas(
        run, schema="zone_id long, psum long, pcount long, pmin long, pmax long"
    )
    return partials.groupBy("zone_id").agg(
        F.sum("pcount").alias("n_px"),
        F.sum("psum").alias("sum_val"),
        F.min("pmin").alias("min_val"),
        F.max("pmax").alias("max_val"),
    )


def zonal_correlation(
    tiles: DataFrame,
    zones: DataFrame,
    surface_fn,
    tile_size: int = 256,
    payload: str = "bytes",
    band: int = 0,
    zone_id: str = "zone_id",
) -> DataFrame:
    """Per-zone Pearson correlation between a stored raster band and a
    second surface — the two-raster zonal reduction (ArcGIS Band
    Collection Statistics / R terra::layerCor, evaluated zonally): does
    elevation track density, does slope track burn severity, per
    district.

    `surface_fn(gx, gy) -> int64 array` computes the second surface from
    GLOBAL pixel coordinates inside the same fused Arrow pass that
    decodes the stored band — the payload crosses Arrow once, and only
    slim per-(zone, tile) moment partials (n, Σa, Σb, Σab, Σa², Σb²)
    ever shuffle; they combine associatively, so giant zones cost their
    tile count.  The epilogue is exact int64 moment algebra
    (cov_n = nΣab − ΣaΣb etc.) plus ONE literal float expression for
    r (round 6), NULL when either variance is zero — identical
    expression tree in the SQL oracle."""
    n_zones = zones.count()
    if n_zones > _ZONAL_MAX_ZONES:
        raise ValueError(
            f"zonal_correlation broadcasts the zone table; {n_zones} zones "
            f"exceeds the {_ZONAL_MAX_ZONES} guard"
        )
    zrows = zones.select(zone_id, "x0", "y0", "x1", "y1").collect()
    zid = np.array([r[0] for r in zrows], dtype=np.int64)
    zx0 = np.array([r[1] for r in zrows], dtype=np.int64)
    zy0 = np.array([r[2] for r in zrows], dtype=np.int64)
    zx1 = np.array([r[3] for r in zrows], dtype=np.int64)
    zy1 = np.array([r[4] for r in zrows], dtype=np.int64)
    bc = tiles.sparkSession.sparkContext.broadcast((zid, zx0, zy0, zx1, zy1))
    ts = int(tile_size)

    def run(batches):
        izid, ix0, iy0, ix1, iy1 = bc.value
        cols = ("zone_id", "pn", "psa", "psb", "psab", "psa2", "psb2")
        for pdf in batches:
            out = {c: [] for c in cols}
            for x, y, blob in zip(pdf["x"], pdf["y"], pdf[payload]):
                tx0, ty0 = int(x) * ts, int(y) * ts
                hit = np.nonzero(
                    (ix0 < tx0 + ts) & (ix1 > tx0) & (iy0 < ty0 + ts) & (iy1 > ty0)
                )[0]
                if hit.size == 0:
                    continue
                img = decode_image(bytes(blob))
                a = img[..., band].astype(np.int64)
                gy, gx = np.mgrid[ty0 : ty0 + ts, tx0 : tx0 + ts]
                b = surface_fn(gx, gy).astype(np.int64)
                for j in hit:
                    cx0, cx1 = max(int(ix0[j]) - tx0, 0), min(int(ix1[j]) - tx0, ts)
                    cy0, cy1 = max(int(iy0[j]) - ty0, 0), min(int(iy1[j]) - ty0, ts)
                    wa = a[cy0:cy1, cx0:cx1]
                    wb = b[cy0:cy1, cx0:cx1]
                    out["zone_id"].append(int(izid[j]))
                    out["pn"].append(wa.size)
                    out["psa"].append(int(wa.sum()))
                    out["psb"].append(int(wb.sum()))
                    out["psab"].append(int((wa * wb).sum()))
                    out["psa2"].append(int((wa * wa).sum()))
                    out["psb2"].append(int((wb * wb).sum()))
            yield pd.DataFrame(out)

    partials = tiles.mapInPandas(
        run,
        schema="zone_id long, pn long, psa long, psb long, psab long, "
        "psa2 long, psb2 long",
    )
    mom = partials.groupBy("zone_id").agg(
        F.sum("pn").alias("n_px"),
        F.sum("psa").alias("sum_a"),
        F.sum("psb").alias("sum_b"),
        F.sum("psab").alias("sum_ab"),
        F.sum("psa2").alias("sum_a2"),
        F.sum("psb2").alias("sum_b2"),
    )
    return mom.select(
        "zone_id", "n_px", "sum_a", "sum_b", "sum_ab", "sum_a2", "sum_b2",
        F.expr("n_px * sum_ab - sum_a * sum_b").alias("cov_n"),
        F.expr("n_px * sum_a2 - sum_a * sum_a").alias("var_a_n"),
        F.expr("n_px * sum_b2 - sum_b * sum_b").alias("var_b_n"),
        F.expr(
            "CASE WHEN n_px * sum_a2 - sum_a * sum_a > 0 "
            " AND n_px * sum_b2 - sum_b * sum_b > 0 "
            "THEN round(CAST(n_px * sum_ab - sum_a * sum_b AS DOUBLE) / "
            "sqrt(CAST(n_px * sum_a2 - sum_a * sum_a AS DOUBLE) * "
            "CAST(n_px * sum_b2 - sum_b * sum_b AS DOUBLE)), 6) "
            "ELSE NULL END"
        ).alias("r_6"),
    )


def tile_ssim(
    tiles: DataFrame,
    transform_fn,
    tile_size: int = 256,
    payload: str = "bytes",
    band: int = 0,
) -> DataFrame:
    """Per-tile global SSIM quality audit: stored band vs a degraded
    version computed in-kernel (Wang et al. 2004 single-window SSIM —
    the re-encode quality gate: "would palette quantization / bit-depth
    reduction visibly hurt this tile?", scored tile-by-tile so a
    pyramid job can keep the cheap encoding only where SSIM stays high).

    `transform_fn(band_array) -> int64 array` is the candidate
    degradation (quantizer, bit-crush) applied to the decoded pixels
    inside the SAME fused Arrow pass — payload crosses Arrow once and
    only integer moments (n, Σa, Σb, Σab, Σa², Σb²) leave Python.  The
    SSIM epilogue is ONE literal-constant float expression over the
    exact moments (C1 = (0.01*255)^2, C2 = (0.03*255)^2), identical
    text in the SQL oracle, rounded to 6.

    Output: (x, y, n_px, sum_a, sum_b, sum_ab, sum_a2, sum_b2, ssim_6).
    """
    def run(batches):
        cols = ("x", "y", "pn", "psa", "psb", "psab", "psa2", "psb2")
        for pdf in batches:
            out = {c: [] for c in cols}
            for x, y, blob in zip(pdf["x"], pdf["y"], pdf[payload]):
                img = decode_image(bytes(blob))
                a = img[..., band].astype(np.int64)
                b = transform_fn(a).astype(np.int64)
                out["x"].append(int(x))
                out["y"].append(int(y))
                out["pn"].append(a.size)
                out["psa"].append(int(a.sum()))
                out["psb"].append(int(b.sum()))
                out["psab"].append(int((a * b).sum()))
                out["psa2"].append(int((a * a).sum()))
                out["psb2"].append(int((b * b).sum()))
            yield pd.DataFrame(out)

    mom = tiles.mapInPandas(
        run,
        schema="x long, y long, pn long, psa long, psb long, psab long, "
        "psa2 long, psb2 long",
    )
    ssim = ssim_epilogue_sql()
    return mom.select(
        "x", "y",
        F.col("pn").alias("n_px"),
        F.col("psa").alias("sum_a"),
        F.col("psb").alias("sum_b"),
        F.col("psab").alias("sum_ab"),
        F.col("psa2").alias("sum_a2"),
        F.col("psb2").alias("sum_b2"),
        F.expr(ssim).alias("ssim_6"),
    )


def ssim_epilogue_sql() -> str:
    """The identical SSIM expression for the DuckDB oracle (operates on
    the same column names pn/psa/psb/psab/psa2/psb2)."""
    c1 = f"{(0.01 * 255.0) ** 2:.17e}"
    c2 = f"{(0.03 * 255.0) ** 2:.17e}"
    return (
        "round(((2.0 * (CAST(psa AS DOUBLE) / CAST(pn AS DOUBLE)) * "
        "(CAST(psb AS DOUBLE) / CAST(pn AS DOUBLE)) + {c1}) * "
        "(2.0 * (CAST(psab AS DOUBLE) / CAST(pn AS DOUBLE) - "
        "(CAST(psa AS DOUBLE) / CAST(pn AS DOUBLE)) * "
        "(CAST(psb AS DOUBLE) / CAST(pn AS DOUBLE))) + {c2})) / "
        "(((CAST(psa AS DOUBLE) / CAST(pn AS DOUBLE)) * "
        "(CAST(psa AS DOUBLE) / CAST(pn AS DOUBLE)) + "
        "(CAST(psb AS DOUBLE) / CAST(pn AS DOUBLE)) * "
        "(CAST(psb AS DOUBLE) / CAST(pn AS DOUBLE)) + {c1}) * "
        "((CAST(psa2 AS DOUBLE) / CAST(pn AS DOUBLE) - "
        "(CAST(psa AS DOUBLE) / CAST(pn AS DOUBLE)) * "
        "(CAST(psa AS DOUBLE) / CAST(pn AS DOUBLE))) + "
        "(CAST(psb2 AS DOUBLE) / CAST(pn AS DOUBLE) - "
        "(CAST(psb AS DOUBLE) / CAST(pn AS DOUBLE)) * "
        "(CAST(psb AS DOUBLE) / CAST(pn AS DOUBLE))) + {c2})), 6)"
    ).format(c1=c1, c2=c2)


_BURN_MAX_POLYS = 200_000  # broadcast guard, same scale contract as zonal


def rasterize_polygons(
    polys,
    tile_size: int = 256,
    spark=None,
    emit_bytes: bool = True,
) -> "DataFrame":
    """Vector -> raster burn: render a polygon layer into raster tiles —
    the inverse of zonal_stats and the missing direction of the north
    star's "raster<->vector tile composition" (GDAL rasterize / mapnik
    burn role, absent from the reference toolbox).

    `polys`: list of (poly_id, value, rings) with rings a list of numpy
    (n,2) arrays in GLOBAL PIXEL coordinates of the target zoom (outer ring
    + holes, even-odd fill — the joins/pip.py convention and kernel).
    Pixel (i,j) of tile (x,y) is covered iff its CENTER
    (x*ts + i + 0.5, y*ts + j + 0.5) lies inside; burned value = max over
    covering polygons (associative, order-free). For integer-aligned
    half-open rectangles [x0,x1)x[y0,y1) this reduces to the integer grid
    range(x0,x1) x range(y0,y1) — what lets the registry oracle replay
    coverage exactly in SQL with no transcendentals.

    100 TB shape: the polygon layer is a size-guarded broadcast dimension
    (like zonal_stats / the PIP join); the TILE fan-out is distributed —
    per-polygon pixel bboxes explode JVM-side into covered tile coords
    (sequence x sequence, a continent-sized polygon fans out to its
    millions of tiles across the cluster), distinct-ed, then one
    mapInPandas burn per tile. Payload bytes are PRODUCED post-shuffle and
    never enter one; `emit_bytes=False` skips PNG encode for count-only
    consumers (the r3 payload-transfer lesson).
    """
    import pandas as pd

    from ..codecs import encode_png
    from ..joins.pip import points_in_polygon_multi

    if len(polys) > _BURN_MAX_POLYS:
        raise ValueError(
            f"rasterize_polygons broadcasts the polygon layer; {len(polys)} "
            f"exceeds the {_BURN_MAX_POLYS} guard — split the layer or burn "
            f"per cell partition"
        )
    ts = int(tile_size)
    rows = []
    for pid, value, rings in polys:
        pts = np.vstack(rings)
        rows.append(
            (
                int(pid),
                int(value),
                int(np.floor(pts[:, 0].min() / ts)),
                int(np.floor(pts[:, 1].min() / ts)),
                int(np.floor((pts[:, 0].max() - 1e-9) / ts)),
                int(np.floor((pts[:, 1].max() - 1e-9) / ts)),
            )
        )
    bbox_df = spark.createDataFrame(
        rows, "poly_id long, value int, tx0 int, ty0 int, tx1 int, ty1 int"
    )
    tiles = (
        bbox_df.select(
            F.explode(F.sequence("tx0", "tx1")).alias("x"),
            F.sequence("ty0", "ty1").alias("ys"),
        )
        .select("x", F.explode("ys").alias("y"))
        .distinct()
    )

    def _close(r):
        a = np.asarray(r, dtype=np.float64)
        # points_in_polygon iterates ring[:-1]->ring[1:] edges, i.e. expects
        # an explicitly closed ring; close it here so callers may pass either
        return a if (a[0] == a[-1]).all() else np.vstack([a, a[:1]])

    payload = [(int(p), int(v), [_close(r) for r in rings]) for p, v, rings in polys]
    bc = spark.sparkContext.broadcast(payload)

    def burn(batches):
        pl = bc.value
        bxs = [(np.vstack(r)[:, 0].min(), np.vstack(r)[:, 0].max(),
                np.vstack(r)[:, 1].min(), np.vstack(r)[:, 1].max()) for _, _, r in pl]
        ii, jj = np.meshgrid(np.arange(ts), np.arange(ts))
        for pdf in batches:
            out = {"x": [], "y": [], "n_polys": [], "n_covered": []}
            if emit_bytes:
                out["bytes"] = []
                out["fmt"] = []
            for x, y in zip(pdf["x"], pdf["y"]):
                tx0, ty0 = int(x) * ts, int(y) * ts
                cx = tx0 + ii.ravel() + 0.5
                cy = ty0 + jj.ravel() + 0.5
                img = np.zeros(ts * ts, dtype=np.uint8)
                n_hit = 0
                for (pid, val, rings), (bx0, bx1, by0, by1) in zip(pl, bxs):
                    if bx1 <= tx0 or bx0 >= tx0 + ts or by1 <= ty0 or by0 >= ty0 + ts:
                        continue
                    n_hit += 1
                    inside = points_in_polygon_multi(cx, cy, rings)
                    np.maximum(img, np.where(inside, np.uint8(val), np.uint8(0)), out=img)
                out["x"].append(int(x))
                out["y"].append(int(y))
                out["n_polys"].append(n_hit)
                out["n_covered"].append(int((img > 0).sum()))
                if emit_bytes:
                    out["bytes"].append(encode_png(img.reshape(ts, ts)))
                    out["fmt"].append("png")
            yield pd.DataFrame(out)

    schema = "x int, y int, n_polys int, n_covered long" + (
        ", bytes binary, fmt string" if emit_bytes else ""
    )
    return tiles.mapInPandas(burn, schema=schema)


def raster_crosstab(
    tiles: DataFrame,
    band_a: int = 0,
    band_b: int = 1,
    quant_a: int = 1,
    quant_b: int = 1,
    payload: str = "bytes",
) -> DataFrame:
    """Cross-tabulation of two class bands of a tiled raster — the ArcGIS
    Tabulate Area / GDAL `Combine` reduction (absent from the reference
    toolbox, whose raster ops are per-tile pixel transforms): one output
    row per observed (class_a, class_b) pair with its pixel count, where
    class = band_value // quant (quant > 1 reclassifies a continuous band
    into equal-width bins map-side, e.g. elevation // 32 -> 32 m bands).

    100 TB shape: each tile decodes ONCE in a single Arrow crossing and
    emits at most classes_a x classes_b slim partial rows (a 2-D
    bincount), so the shuffle moves O(tiles x observed-class-pairs)
    integers and the payload never enters an Exchange; the final groupBy
    is over the tiny class-pair key space — no skew risk at any input
    size (hot classes just sum bigger int64 partials)."""
    qa, qb = int(quant_a), int(quant_b)
    if qa < 1 or qb < 1:
        raise ValueError("raster_crosstab: quant_a/quant_b must be >= 1")

    def run(batches):
        for pdf in batches:
            out = {"class_a": [], "class_b": [], "n": []}
            for blob in pdf[payload]:
                img = decode_image(bytes(blob))
                a = img[..., band_a].astype(np.int64) // qa
                b = img[..., band_b].astype(np.int64) // qb
                nb = int(b.max()) + 1
                packed = np.bincount((a * nb + b).ravel())
                nz = np.nonzero(packed)[0]
                out["class_a"].extend((nz // nb).tolist())
                out["class_b"].extend((nz % nb).tolist())
                out["n"].extend(packed[nz].tolist())
            yield pd.DataFrame(out)

    partials = tiles.mapInPandas(run, schema="class_a long, class_b long, n long")
    return partials.groupBy("class_a", "class_b").agg(F.sum("n").alias("n_px"))


def zonal_percentiles(
    tiles: DataFrame,
    zones: DataFrame,
    percentiles: tuple[int, ...] = (25, 50, 75),
    tile_size: int = 256,
    payload: str = "bytes",
    band: int = 0,
    zone_id: str = "zone_id",
) -> DataFrame:
    """Exact zonal order statistics — nearest-rank percentiles + zonal
    mode per vector zone (ArcGIS Zonal Statistics MEDIAN/PERCENTILE/
    MAJORITY; absent from the reference toolbox) via distributed
    HISTOGRAM INVERSION: naive sorting of 10^12 pixels is a full-data
    shuffle, but an 8-bit band has <= 256 distinct values, so each tile
    emits a per-zone bincount and the quantile is read off the cumulative
    histogram.

    Percentile rule: p-th percentile = smallest value v whose cumulative
    count >= ceil(p * n_px / 100) (lower nearest-rank — integer-exact,
    replayed verbatim by the SQL oracle).  Mode ties take the SMALLEST
    value.

    100 TB shape: zones broadcast (same guard as zonal_stats); each tile
    decodes ONCE and emits <= 256 slim (zone, val, n) partials per
    touched zone; the only shuffle moves O(zones x 256) integers; the
    per-zone cumulative window is over <= 256 rows — no skew, no
    payload movement, no full-data sort."""
    from pyspark.sql.window import Window

    pcts = [int(p) for p in percentiles]
    if any(p < 1 or p > 100 for p in pcts):
        raise ValueError("percentiles must be in [1, 100]")
    n_zones = zones.count()
    if n_zones > _ZONAL_MAX_ZONES:
        raise ValueError(
            f"zonal_percentiles broadcasts the zone table; {n_zones} zones "
            f"exceeds the {_ZONAL_MAX_ZONES} guard — tile the zones"
        )
    zrows = zones.select(zone_id, "x0", "y0", "x1", "y1").collect()
    zid = np.array([r[0] for r in zrows], dtype=np.int64)
    zx0 = np.array([r[1] for r in zrows], dtype=np.int64)
    zy0 = np.array([r[2] for r in zrows], dtype=np.int64)
    zx1 = np.array([r[3] for r in zrows], dtype=np.int64)
    zy1 = np.array([r[4] for r in zrows], dtype=np.int64)
    bc = tiles.sparkSession.sparkContext.broadcast((zid, zx0, zy0, zx1, zy1))
    ts = int(tile_size)

    def run(batches):
        izid, ix0, iy0, ix1, iy1 = bc.value
        for pdf in batches:
            out = {"zone_id": [], "val": [], "n": []}
            for x, y, blob in zip(pdf["x"], pdf["y"], pdf[payload]):
                tx0, ty0 = int(x) * ts, int(y) * ts
                hit = np.nonzero(
                    (ix0 < tx0 + ts) & (ix1 > tx0) & (iy0 < ty0 + ts) & (iy1 > ty0)
                )[0]
                if hit.size == 0:
                    continue
                v = decode_image(bytes(blob))[..., band].astype(np.int64)
                for j in hit:
                    cx0, cx1 = max(int(ix0[j]) - tx0, 0), min(int(ix1[j]) - tx0, ts)
                    cy0, cy1 = max(int(iy0[j]) - ty0, 0), min(int(iy1[j]) - ty0, ts)
                    counts = np.bincount(v[cy0:cy1, cx0:cx1].ravel())
                    nz = np.nonzero(counts)[0]
                    out["zone_id"].extend([int(izid[j])] * nz.size)
                    out["val"].extend(nz.tolist())
                    out["n"].extend(counts[nz].tolist())
            yield pd.DataFrame(out)

    partials = tiles.mapInPandas(run, schema="zone_id long, val long, n long")
    counts = partials.groupBy("zone_id", "val").agg(F.sum("n").alias("n"))
    w = Window.partitionBy("zone_id").orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.withColumn("cum", F.sum("n").over(w)).withColumn(
        "n_px", F.sum("n").over(Window.partitionBy("zone_id"))
    )
    sel = [
        F.min(
            F.when(
                # ceil(p * n_px / 100) on non-negative int64: (a + 99) div 100
                F.col("cum") >= F.expr(f"({p} * n_px + 99) div 100"),
                F.col("val"),
            )
        ).alias(f"p{p}")
        for p in pcts
    ]
    # mode: max count, ties to the SMALLEST value (struct max on
    # (n, 255 - val) — val is bounded by the 8-bit domain)
    mode = (255 - F.max(F.struct(F.col("n"), (F.lit(255) - F.col("val")).alias("nv")))["nv"]).alias("mode_val")
    return cum.groupBy("zone_id").agg(
        F.max("n_px").alias("n_px"), mode, *sel
    )


def tile_value_hist(
    tiles: DataFrame,
    tile_size: int = 256,
    payload: str = "bytes",
    band: int = 0,
) -> DataFrame:
    """(x, y, v, c): per-tile pixel-value histogram in ONE fused Arrow
    pass — each tile emits its <= 256 occupied bins map-side (np.bincount
    over the decoded band), so the payload never enters an Exchange and
    the downstream relation is <= 256 rows per tile regardless of tile
    size.  The groupBy collapses partials if a source ever splits a tile
    across rows; for the one-row-per-tile containers it is a no-op
    aggregation over already-final bins.  Feeds exact-entropy /
    low-information gates (the blur_gate companion)."""
    import pandas as pd

    from ..codecs import decode_image

    def run(batches):
        for pdf in batches:
            rows = []
            for x, y, blob in zip(pdf["x"], pdf["y"], pdf[payload]):
                v = decode_image(bytes(blob))[..., band].ravel()
                counts = np.bincount(v)
                for val in np.nonzero(counts)[0]:
                    rows.append([int(x), int(y), int(val), int(counts[val])])
            yield pd.DataFrame(rows, columns=["x", "y", "v", "c"])

    h = tiles.mapInPandas(run, schema="x long, y long, v long, c long")
    return h.groupBy("x", "y", "v").agg(F.sum("c").alias("c"))
