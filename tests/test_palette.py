"""Palette PNG8 (codecs.encode_png8 / median_cut_palette) + the
raster_palette operator: determinism, lossless small-palette round-trip,
error bounds, tRNS alpha, size win, fused Spark pass, VPL."""

import numpy as np
import pytest

from versatiles_rs_spark.codecs import (
    decode_png,
    encode_png,
    encode_png8,
    median_cut_palette,
    nearest_palette_index,
)


def _gradient(h=64, w=64):
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(x * 255 // (w - 1)), (y * 255 // (h - 1)), ((x + y) * 255 // (h + w - 2))],
        axis=2,
    ).astype(np.uint8)
    return img


def test_median_cut_deterministic_and_bounded():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (5000, 3), dtype=np.int64).astype(np.uint8)
    p1 = median_cut_palette(px, 64)
    p2 = median_cut_palette(px.copy(), 64)
    assert np.array_equal(p1, p2)
    assert len(p1) <= 64
    # canonical order: lexicographically sorted, unique
    assert np.array_equal(p1, np.unique(p1, axis=0))


def test_small_color_count_is_lossless():
    # <= n_colors distinct colors: palette == the exact colors, indices exact
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:8] = (255, 0, 0)
    img[8:, :8] = (0, 128, 255)
    img[8:, 8:] = (10, 20, 30)
    pal = median_cut_palette(img, 256)
    assert {tuple(c) for c in pal} == {(255, 0, 0), (0, 128, 255), (10, 20, 30)}
    out = decode_png(encode_png8(img, 256))
    assert np.array_equal(out, img)


def test_png8_roundtrip_error_bound_and_size_win():
    img = _gradient()
    blob8 = encode_png8(img, 256)
    blob24 = encode_png(img)
    out = decode_png(blob8)
    assert out.shape == img.shape
    # every decoded pixel IS a palette color, and quantization error is
    # small for a smooth gradient
    err = np.abs(out.astype(int) - img.astype(int)).max()
    assert err <= 24
    assert len(blob8) < len(blob24)  # the point of PNG8
    # decode maps indices through PLTE: at most 256 distinct colors
    assert len(np.unique(out.reshape(-1, 3), axis=0)) <= 256


def test_png8_alpha_trns_roundtrip():
    img = np.zeros((8, 8, 4), dtype=np.uint8)
    img[..., :3] = 200
    img[..., 3] = 255
    img[:4, :, 3] = 0  # transparent top half
    img[:4, :, :3] = 50
    out = decode_png(encode_png8(img, 16))
    assert out.shape == (8, 8, 4)
    assert np.array_equal(out, img)  # 2 colors -> lossless incl. alpha


def test_gray_and_lumaa_promote():
    g = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 4)[:, :, None]
    out = decode_png(encode_png8(g, 256))
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out[..., 0], out[..., 1])
    la = np.concatenate([g, np.full_like(g, 200)], axis=2)
    out = decode_png(encode_png8(la, 256))
    assert out.shape == (8, 8, 4) and (out[..., 3] == 200).all()


def test_nearest_index_tie_breaks_low_index():
    pal = np.array([[10, 0, 0], [30, 0, 0]], dtype=np.uint8)
    px = np.array([[[20, 0, 0]]], dtype=np.uint8)  # equidistant
    assert nearest_palette_index(px, pal)[0] == 0


def test_raster_palette_spark_pass(spark):
    from versatiles_rs_spark.operators.raster import raster_palette

    img = _gradient(32, 32)
    rows = [(0, 0, 0, bytearray(encode_png(img)), "png"),
            (0, 1, 0, bytearray(encode_png(img[::-1])), "png")]
    df = spark.createDataFrame(rows, "z int, x long, y long, bytes binary, fmt string")
    out = raster_palette(df, n_colors=64).collect()
    assert len(out) == 2
    for r in out:
        blob = bytes(r.bytes)
        assert blob[25] == 3  # IHDR color type: palette
        dec = decode_png(blob)
        assert dec.shape == (32, 32, 3)
        assert len(np.unique(dec.reshape(-1, 3), axis=0)) <= 64
    # determinism: second run byte-identical
    out2 = raster_palette(df, n_colors=64).collect()
    assert {(r.z, r.x, r.y): bytes(r.bytes) for r in out} == \
           {(r.z, r.x, r.y): bytes(r.bytes) for r in out2}


def test_raster_palette_vpl(spark, tmp_path):
    from versatiles_rs_spark.plans.vpl import run_vpl

    df = run_vpl(spark, "from_debug format=png | raster_palette colors=32")
    rows = df.limit(3).collect()
    assert rows
    for r in rows:
        blob = bytes(r.bytes)
        assert blob[25] == 3
        assert len(np.unique(decode_png(blob).reshape(-1, 3), axis=0)) <= 32
