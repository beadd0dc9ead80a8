"""from_gdal_raster substitute: warp math, pruning, pixel oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark import tile_math as tm
from versatiles_rs_spark.codecs import decode_image
from versatiles_rs_spark.sources.raster import GeoRaster, open_raster, raster_to_tiles


@pytest.fixture(scope="module")
def gradient():
    """256x512 RGB gradient over Europe-ish bbox (mirrors the reference's
    gradient.tif fixture)."""
    y, x = np.mgrid[0:256, 0:512]
    data = np.stack([(x // 2) % 256, y % 256, np.full_like(x, 200)], axis=-1).astype(np.uint8)
    return GeoRaster(data, (0.0, 40.0, 20.0, 60.0))


def test_open_raster_gated_for_non_tiff():
    """TIFF decode is real (libtiff); other formats stay gated on GDAL."""
    with pytest.raises(NotImplementedError, match="rasterio|GDAL"):
        open_raster("world.jp2")


def test_band_count_validated():
    with pytest.raises(ValueError, match="band count"):
        GeoRaster(np.zeros((4, 4, 5), np.uint8), (0, 0, 1, 1))


def test_tile_enumeration_pruned_to_bbox(spark, gradient):
    tiles = raster_to_tiles(spark, gradient, 4, 6, tile_size=8)
    rows = tiles.select("z", "x", "y").collect()
    for r in rows:
        # every emitted tile intersects the raster bbox
        w, s, e, n = tm.tile_to_geo_bbox(r.z, np.array([r.x]), np.array([r.y]))
        assert e[0] >= 0.0 - 1e-6 and w[0] <= 20.0 + 1e-6
        assert n[0] >= 40.0 - 1e-6 and s[0] <= 60.0 + 1e-6
    by_z = {z: sum(1 for r in rows if r.z == z) for z in (4, 5, 6)}
    assert by_z[5] > by_z[4] and by_z[6] > by_z[5]


def test_warp_pixels_match_direct_sampling(spark, gradient):
    """Decoded tile pixels equal a direct numpy inverse-mercator sample —
    the warp oracle."""
    ts = 16
    tiles = raster_to_tiles(spark, gradient, 6, 6, tile_size=ts)
    # a tile fully inside the bbox: pick one around lon=10, lat=50
    tx, ty = tm.lonlat_to_tile(np.array([10.0]), np.array([50.0]), 6)
    row = tiles.filter((F.col("x") == int(tx[0])) & (F.col("y") == int(ty[0]))).first()
    img = decode_image(bytes(row.bytes))
    px = (np.arange(ts) + 0.5) / ts
    n = 1 << 6
    lon = (int(tx[0]) + px) / n * 360.0 - 180.0
    yf = (int(ty[0]) + px) / n
    lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * yf))))
    expect = gradient.sample_lonlat(
        np.repeat(lon[None, :], ts, axis=0).ravel(),
        np.repeat(lat[:, None], ts, axis=1).ravel(),
    ).reshape(ts, ts, 3)
    assert (img == expect).all()


def test_outside_extent_is_transparent_zero(spark, gradient):
    ts = 8
    tiles = raster_to_tiles(spark, gradient, 4, 4, tile_size=ts)
    # westernmost emitted tile contains the bbox edge; pixels west of lon=0
    # must be 0
    row = tiles.orderBy("x").first()
    img = decode_image(bytes(row.bytes))
    w, s, e, n = tm.tile_to_geo_bbox(4, np.array([row.x]), np.array([row.y]))
    if w[0] < 0:  # tile sticks out west of the raster
        assert (img[:, 0] == 0).all()


def test_open_raster_gradient_tif(spark):
    """REAL GeoTIFF decode (system libtiff + manual GeoTIFF IFD parse)
    against the reference's own testdata/gradient.tif, checked against the
    reference's average-color goldens (from_gdal/raster/operation.rs:330-338:
    16px tiles at z=1 -> [63,43,0], [192,43,0], [63,212,0], [192,212,0])."""
    import os

    import numpy as np
    import pytest

    from versatiles_rs_spark.codecs import decode_image
    from versatiles_rs_spark.sources.raster import HAS_LIBTIFF, open_raster, raster_to_tiles

    tif = "/root/reference/testdata/gradient.tif"
    if not (HAS_LIBTIFF and os.path.exists(tif)):
        pytest.skip("libtiff or reference testdata absent")
    r = open_raster(tif)
    assert r.data.shape == (256, 256, 3)
    assert r.bbox == (-180.0, -90.0, 180.0, 90.0)
    # red grows with x, green with y (the gradient)
    assert r.data[0, 255, 0] == 255 and r.data[255, 0, 1] == 255

    tiles = raster_to_tiles(spark, r, 1, 1, tile_size=16)
    got = {(row.x, row.y): decode_image(bytes(row.bytes)) for row in tiles.collect()}
    want = {(0, 0): (63, 43, 0), (1, 0): (192, 43, 0), (0, 1): (63, 212, 0), (1, 1): (192, 212, 0)}
    assert set(got) == set(want)
    for k, expect in want.items():
        avg = got[k][:, :, :3].reshape(-1, 3).mean(axis=0)
        assert np.abs(avg - np.array(expect)).max() <= 6, (k, avg, expect)
