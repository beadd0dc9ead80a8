"""Georeferenced-raster ingestion: the from_gdal_raster substitute.

Parity: /root/reference/versatiles_pipeline/src/operations/read/from_gdal/
raster/operation.rs (+ warp setup bandmapping.rs:168-213): warp a source
raster to EPSG:3857 and cut tile_size^2 tiles per zoom level.

No GDAL in this environment, so the *dataset* is an in-memory georeferenced
grid (numpy array + WGS84 geotransform) and file-format decode is the only
stub (`open_raster` raises for real formats — plug rasterio/GDAL there). The
warp math is real: for every output tile pixel, compute its web-mercator
lat/lng, inverse-map into source grid coordinates, nearest-neighbor sample
(GDAL's default resampler). Distribution: the tile-coordinate space is
enumerated with spark.range and each task samples a broadcast of the source
grid — tiles never exist before they are computed, exactly like the
reference's per-tile warp.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .. import tile_math as tm
from ..codecs import encode_image


class GeoRaster:
    """In-memory georeferenced raster: data (H, W, C) uint8 over a WGS84
    bbox (lon_min, lat_min, lon_max, lat_max), row 0 = north edge."""

    def __init__(self, data: np.ndarray, bbox: tuple[float, float, float, float]):
        if data.ndim == 2:
            data = data[:, :, None]
        if data.shape[2] not in (1, 2, 3, 4):  # bandmapping.rs: 1-4 bands only
            raise ValueError(f"unsupported band count {data.shape[2]}")
        self.data = np.ascontiguousarray(data, dtype=np.uint8)
        self.bbox = bbox

    def sample_lonlat(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Nearest-neighbor sample at WGS84 coords; out-of-extent -> 0
        (transparent)."""
        x0, y0, x1, y1 = self.bbox
        h, w, c = self.data.shape
        fx = (lon - x0) / (x1 - x0) * w
        fy = (y1 - lat) / (y1 - y0) * h  # row 0 = north
        inside = (fx >= 0) & (fx < w) & (fy >= 0) & (fy < h)
        xi = np.clip(fx.astype(np.int64), 0, w - 1)
        yi = np.clip(fy.astype(np.int64), 0, h - 1)
        out = self.data[yi, xi]
        out[~inside] = 0
        return out


def open_raster(path: str) -> GeoRaster:
    """STUB at the file-format boundary: no GDAL/rasterio in this container.
    Production: `rasterio.open(path)` -> GeoRaster(arr, bounds)."""
    raise NotImplementedError(
        f"cannot decode raster file {path!r}: no GDAL/rasterio in this "
        "environment — construct GeoRaster from an array instead"
    )


def raster_to_tiles(
    spark: SparkSession,
    raster: GeoRaster,
    level_min: int,
    level_max: int,
    tile_size: int = 256,
    tile_format: str = "png",
) -> DataFrame:
    """Cut the raster into web-mercator tiles for z in [level_min, level_max].

    Plan: enumerate only the tiles intersecting the raster's bbox per level
    (bbox-pyramid pruning at plan build, like the reference's level loop in
    operation.rs) -> distribute tile coords -> each task warps its tiles from
    the broadcast source grid (vectorized inverse mercator per pixel row/col).
    """
    coords = []
    for z in range(level_min, level_max + 1):
        tx0, ty0, tx1, ty1 = tm.geo_bbox_to_tile_bbox(z, *raster.bbox)
        for x in range(tx0, tx1 + 1):
            for y in range(ty0, ty1 + 1):
                coords.append((z, x, y))
    if not coords:
        return spark.createDataFrame([], "z int, x long, y long, fmt string, bytes binary")
    bc = spark.sparkContext.broadcast(raster)
    cdf = spark.createDataFrame(coords, "z int, x long, y long")
    parts = min(len(coords), spark.sparkContext.defaultParallelism * 4)
    cdf = cdf.repartition(parts)

    def warp(batches):
        src: GeoRaster = bc.value
        px = (np.arange(tile_size) + 0.5) / tile_size
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                # pixel-center lon/lat grids for this tile (inverse mercator)
                n = 1 << r.z
                lon = (r.x + px) / n * 360.0 - 180.0
                yf = (r.y + px) / n
                lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * yf))))
                lon_g = np.repeat(lon[None, :], tile_size, axis=0).ravel()
                lat_g = np.repeat(lat[:, None], tile_size, axis=1).ravel()
                img = src.sample_lonlat(lon_g, lat_g).reshape(tile_size, tile_size, -1)
                rows.append((r.z, r.x, r.y, tile_format, encode_image(img, tile_format)))
            yield pd.DataFrame(rows, columns=["z", "x", "y", "fmt", "bytes"])

    return cdf.mapInPandas(warp, schema="z int, x long, y long, fmt string, bytes binary")
