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


def _load_libtiff():
    import ctypes
    import ctypes.util

    for n in ("libtiff.so.6", "libtiff.so.5", ctypes.util.find_library("tiff") or "libtiff.so"):
        try:
            t = ctypes.CDLL(n)
        except OSError:
            continue
        t.TIFFOpen.restype = ctypes.c_void_p
        t.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        t.TIFFReadRGBAImage.restype = ctypes.c_int
        t.TIFFReadRGBAImage.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
        ]
        t.TIFFClose.restype = None
        t.TIFFClose.argtypes = [ctypes.c_void_p]
        t.TIFFSetWarningHandler.restype = ctypes.c_void_p
        t.TIFFSetWarningHandler.argtypes = [ctypes.c_void_p]
        t.TIFFSetWarningHandler(None)
        return t
    return None


_LIBTIFF = _load_libtiff()
HAS_LIBTIFF = _LIBTIFF is not None


def _geotiff_bbox(path: str) -> tuple[float, float, float, float]:
    """Parse ModelPixelScale (33550) + ModelTiepoint (33922) + the GeoKey CRS
    (34735 key 2048) from the first IFD — a 40-line manual walk, since
    libtiff's tag table doesn't register GeoTIFF's custom tags."""
    import struct

    buf = open(path, "rb").read()
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    off = struct.unpack_from(bo + "I", buf, 4)[0]
    n = struct.unpack_from(bo + "H", buf, off)[0]
    tags: dict[int, tuple] = {}
    sizes = {3: 2, 4: 4, 12: 8}
    fmts = {3: "H", 4: "I", 12: "d"}
    w = h = 0
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, off + 2 + i * 12)
        if typ not in sizes:
            continue
        total = sizes[typ] * cnt
        vpos = off + 10 + i * 12
        if total > 4:
            vpos = struct.unpack_from(bo + "I", buf, vpos)[0]
        vals = struct.unpack_from(bo + f"{cnt}{fmts[typ]}", buf, vpos)
        tags[tag] = vals
        if tag == 256:
            w = vals[0]
        elif tag == 257:
            h = vals[0]
    if 33550 not in tags or 33922 not in tags:
        raise ValueError(f"{path}: no GeoTIFF geotransform tags")
    # CRS check: GeoKey 2048 (GeographicTypeGeoKey) must be EPSG:4326 —
    # arbitrary-CRS warping is GDAL's job (operation.rs); we cover the
    # plain-WGS84 case this environment can express.
    keys = tags.get(34735, ())
    for k in range(4, len(keys), 4):
        if keys[k] == 2048 and keys[k + 3] not in (4326, 9102):
            raise NotImplementedError(
                f"{path}: CRS EPSG:{keys[k + 3]} needs GDAL reprojection"
            )
    sx, sy = tags[33550][0], tags[33550][1]
    px, py, _, gx, gy, _ = tags[33922][:6]
    lon0 = gx - px * sx
    lat0 = gy + py * sy
    return (lon0, lat0 - h * sy, lon0 + w * sx, lat0)


_WORLD_EXTS = {
    ".png": (".pgw", ".pngw"),
    ".jpg": (".jgw", ".jpgw"),
    ".jpeg": (".jgw", ".jpgw"),
    ".webp": (".wpw",),
}


def _world_file_bbox(path: str, w: int, h: int) -> tuple[float, float, float, float]:
    """Parse the ESRI world-file sidecar (.pgw/.jgw/.wld: A D B E C F — pixel
    scale, rotation terms, center of the upper-left pixel) into a WGS84 bbox.
    Rotation must be zero (axis-aligned), matching the GeoTIFF path; rotated
    geotransforms are GDAL's job (from_gdal/raster/operation.rs)."""
    import os

    base, ext = os.path.splitext(path)
    candidates = [base + e for e in _WORLD_EXTS.get(ext.lower(), ())] + [base + ".wld"]
    side = next((c for c in candidates if os.path.exists(c)), None)
    if side is None:
        raise ValueError(
            f"{path}: no world-file sidecar found (tried {[os.path.basename(c) for c in candidates]})"
        )
    vals = [float(line.strip()) for line in open(side) if line.strip()][:6]
    if len(vals) != 6:
        raise ValueError(f"{side}: world file needs 6 numeric lines, got {len(vals)}")
    a, d, b, e, c, f = vals
    if d != 0.0 or b != 0.0:
        raise NotImplementedError(f"{side}: rotated geotransform needs GDAL")
    if a <= 0.0 or e >= 0.0:
        raise ValueError(f"{side}: expected A>0 (east-up) and E<0 (north-up)")
    # C/F reference the CENTER of the upper-left pixel; bbox edges are half a
    # pixel out (the GDAL world-file convention)
    lon0 = c - a / 2.0
    lat1 = f - e / 2.0
    return (lon0, lat1 + h * e, lon0 + w * a, lat1)


def open_raster(path: str) -> GeoRaster:
    """Decode a georeferenced raster file -> GeoRaster.

    TIFF/GeoTIFF is REAL here: pixels via the system libtiff
    (TIFFReadRGBAImage handles strip/tile layout, Deflate/LZW + predictor),
    georeference via a manual GeoTIFF IFD parse — validated against the
    reference's own testdata/gradient.tif. PNG/JPEG/WebP with an ESRI
    world-file sidecar (.pgw/.jgw/.wld) are also real, decoded with the
    engine's own codecs. Other formats (or exotic CRSs) still raise: plug
    rasterio/GDAL there (from_gdal/raster/operation.rs)."""
    import os

    ext = os.path.splitext(path)[1].lower()
    if ext in _WORLD_EXTS:
        from ..codecs import decode_image

        data = decode_image(open(path, "rb").read())
        h, w = data.shape[:2]
        return GeoRaster(data, _world_file_bbox(path, w, h))
    if path.lower().endswith((".tif", ".tiff")) and HAS_LIBTIFF:
        import ctypes

        bbox = _geotiff_bbox(path)
        tif = _LIBTIFF.TIFFOpen(path.encode(), b"r")
        if not tif:
            raise ValueError(f"libtiff cannot open {path}")
        try:
            import struct

            buf = open(path, "rb").read(8)
            # w/h from the same IFD walk (tags 256/257)
            data_bbox = bbox  # already parsed; reuse the IFD for dims
            # minimal re-parse for dims
            bo = "<" if buf[:2] == b"II" else ">"
            full = open(path, "rb").read()
            off = struct.unpack_from(bo + "I", full, 4)[0]
            n = struct.unpack_from(bo + "H", full, off)[0]
            w = h = 0
            for i in range(n):
                tag, typ, cnt = struct.unpack_from(bo + "HHI", full, off + 2 + i * 12)
                if tag in (256, 257) and typ in (3, 4):
                    v = struct.unpack_from(
                        bo + ("H" if typ == 3 else "I"), full, off + 10 + i * 12
                    )[0]
                    w, h = (v, h) if tag == 256 else (w, v)
            raster = (ctypes.c_uint32 * (w * h))()
            ok = _LIBTIFF.TIFFReadRGBAImage(tif, w, h, raster, 1)
            if not ok:
                raise ValueError(f"libtiff failed to decode {path}")
            arr = np.ctypeslib.as_array(raster).view(np.uint8).reshape(h, w, 4)
            arr = arr[::-1].copy()  # TIFFReadRGBAImage is bottom-up
            if (arr[:, :, 3] == 255).all():
                arr = np.ascontiguousarray(arr[:, :, :3])
            return GeoRaster(arr, data_bbox)
        finally:
            _LIBTIFF.TIFFClose(tif)
    raise NotImplementedError(
        f"cannot decode raster file {path!r}: only TIFF via system libtiff is "
        "supported here — plug rasterio/GDAL for other formats"
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
