"""Raster warp (operators/warp.py): numpy replay + identity/round-trip."""

import numpy as np

from versatiles_rs_spark import fixtures
from versatiles_rs_spark.codecs import decode_image
from versatiles_rs_spark.operators.warp import raster_warp


def brute_warp(surface, in_px, out_px, num, den, off):
    og = np.arange(out_px, dtype=np.int64)
    sf = np.clip((og * (num * 256)) // den + off, 0, (in_px - 1) * 256)
    i0 = np.minimum(sf // 256, in_px - 2)
    f = sf - i0 * 256
    v00 = surface[np.ix_(i0, i0)]  # placeholder, replaced below per-axis
    # per-axis indices
    ix0, fx = i0, f
    iy0, fy = i0, f
    v00 = surface[np.ix_(iy0, ix0)]
    v10 = surface[np.ix_(iy0, ix0 + 1)]
    v01 = surface[np.ix_(iy0 + 1, ix0)]
    v11 = surface[np.ix_(iy0 + 1, ix0 + 1)]
    wfx, wfy = fx[None, :], fy[:, None]
    return (
        (256 - wfx) * (256 - wfy) * v00
        + wfx * (256 - wfy) * v10
        + (256 - wfx) * wfy * v01
        + wfx * wfy * v11
        + 32768
    ) // 65536


def test_warp_matches_numpy_replay(spark):
    in_px, out_px = 1024, 512
    gy, gx = np.mgrid[0:in_px, 0:in_px]
    surface = fixtures.zonal_value(gx, gy).astype(np.int64)
    want = brute_warp(surface, in_px, out_px, 3, 2, 128)
    tiles = fixtures.zonal_raster_df(spark, zoom=2, partitions=4)
    got = raster_warp(
        tiles, 4, 4, 2, 2, 3, 2, 128, 3, 2, 128, emit="stats"
    ).collect()
    assert len(got) == 4
    for r in got:
        win = want[r.y * 256 : (r.y + 1) * 256, r.x * 256 : (r.x + 1) * 256]
        assert (r.n_px, r.sum_v, r.min_v, r.max_v) == (
            win.size, int(win.sum()), int(win.min()), int(win.max())
        ), (r.x, r.y)


def test_warp_identity_preserves_pixels(spark):
    """num=den=1, off=0: bilinear at integer positions is exact — the
    warped world equals the source world bit-for-bit."""
    in_px = 1024
    gy, gx = np.mgrid[0:in_px, 0:in_px]
    surface = fixtures.zonal_value(gx, gy).astype(np.int64)
    tiles = fixtures.zonal_raster_df(spark, zoom=2, partitions=4)
    got = raster_warp(tiles, 4, 4, 4, 4, 1, 1, 0, 1, 1, 0, emit="stats").collect()
    assert len(got) == 16
    for r in got:
        win = surface[r.y * 256 : (r.y + 1) * 256, r.x * 256 : (r.x + 1) * 256]
        assert (r.sum_v, r.min_v, r.max_v) == (
            int(win.sum()), int(win.min()), int(win.max())
        ), (r.x, r.y)


def test_warp_tiles_mode_round_trips(spark):
    """emit='tiles' re-encodes; decoding must reproduce the stats-mode
    pixel values exactly (PNG is lossless)."""
    in_px, out_px = 1024, 512
    gy, gx = np.mgrid[0:in_px, 0:in_px]
    surface = fixtures.zonal_value(gx, gy).astype(np.int64)
    want = brute_warp(surface, in_px, out_px, 3, 2, 128)
    tiles = fixtures.zonal_raster_df(spark, zoom=2, partitions=4)
    got = raster_warp(
        tiles, 4, 4, 2, 2, 3, 2, 128, 3, 2, 128, emit="tiles"
    ).collect()
    assert len(got) == 4
    for r in got:
        img = decode_image(bytes(r.bytes))[..., 0].astype(np.int64)
        win = want[r.y * 256 : (r.y + 1) * 256, r.x * 256 : (r.x + 1) * 256]
        assert np.array_equal(img, win), (r.x, r.y)
