"""Round-5 pixel-op oracle gates: pin the numeric identities the
arithmetic-replay oracles (queries.py stacked_blend / raster_flatten_gate /
raster_overscale_gate / recompress_roundtrip) rely on, without Spark."""

import numpy as np

from versatiles_rs_spark import fixtures
from versatiles_rs_spark.operators.raster import flatten_kernel, overscale_kernel
from versatiles_rs_spark.operators.stacked import blend_kernel


def test_uint8_premultiply_roundtrip_is_exact():
    # fl(fl(v/255)*255) == v for every uint8 v — the identity that makes
    # binary-alpha source-over bit-exact selection in the blend oracle
    v = np.arange(256, dtype=np.float64)
    assert np.array_equal(np.round(v / 255.0 * 255.0), v)


def test_blend_kernel_binary_alpha_selects_exactly():
    gx = np.arange(16, dtype=np.int64)[None, :]
    gy = np.arange(16, dtype=np.int64)[:, None]
    v1 = ((3 * gx + 5 * gy) % 251).astype(np.uint8)
    a1 = (((gx + gy) % 2 == 0) * 255).astype(np.uint8)
    v3 = ((13 * gx + 17 * gy) % 239).astype(np.uint8)
    img1 = np.dstack(np.broadcast_arrays(v1, v1, v1, a1)).astype(np.uint8)
    img2 = np.dstack(
        np.broadcast_arrays(v1, v1, v1, np.zeros_like(a1))
    ).astype(np.uint8)
    img3 = np.dstack(np.broadcast_arrays(v3, v3, v3)).astype(np.uint8)
    out, n = blend_kernel([img1, img2, img3], return_n=True)
    assert n == 3  # src2 fully transparent -> fold continues to opaque src3
    expect = np.where(np.broadcast_to(a1, v1.shape) == 255, v1, np.broadcast_to(v3, v1.shape))
    for c in range(3):
        assert np.array_equal(out[..., c], expect)
    assert np.array_equal(out[..., 3], np.full_like(expect, 255))


def test_flatten_kernel_matches_oracle_formula():
    gx = np.arange(64, dtype=np.int64)[None, :]
    gy = np.arange(64, dtype=np.int64)[:, None]
    r, g, b = fixtures.rgb3_values(gx, gy)
    a = (29 * gx + 31 * gy) % 256
    img = np.dstack(np.broadcast_arrays(r, g, b, a)).astype(np.uint8)
    out = flatten_kernel(img, (12, 34, 56))
    for c, (ch, bg) in enumerate([(r, 12), (g, 34), (b, 56)]):
        expect = (ch * a + bg * (255 - a) + 127) // 255
        assert np.array_equal(out[..., c].astype(np.int64), np.broadcast_to(expect, out[..., c].shape))


def test_overscale_kernel_matches_oracle_indexing():
    # child pixel (i, j) of child (x, y) == parent global pixel
    # (16x + i//4, 16y + j//4) at from_zoom=1 -> to_zoom=3, 64px tiles
    size, scale = 64, 4
    gx = np.arange(size, dtype=np.int64)[None, :]
    gy = np.arange(size, dtype=np.int64)[:, None]
    r, g, b = fixtures.rgb3_values(gx, gy)
    parent = np.dstack(np.broadcast_arrays(r, g, b)).astype(np.uint8)
    for dx, dy in [(0, 0), (1, 2), (3, 3)]:
        child = overscale_kernel(parent, dx, dy, scale)
        i = np.arange(size)[None, :]
        j = np.arange(size)[:, None]
        egx = dx * 16 + i // 4
        egy = dy * 16 + j // 4
        expect = (3 * egx + 5 * egy) % 251
        assert np.array_equal(child[..., 0].astype(np.int64), np.broadcast_to(expect, child[..., 0].shape))


def test_recompress_fixture_codecs_roundtrip():
    from versatiles_rs_spark.codecs import compress_blob, decompress_blob

    for i in (0, 1, 2, 50):
        raw = (f"payload-{i}-seg;" * (30 + i % 17)).encode()
        codec = ("none", "gzip", "brotli")[i % 3]
        stored = compress_blob(raw, codec)
        assert decompress_blob(stored, codec) == raw
        if codec != "none":
            assert len(stored) < len(raw)


def test_round5_gates_registered_with_oracles():
    from versatiles_rs_spark.queries import REGISTRY

    for name in (
        "stacked_blend",
        "raster_flatten_gate",
        "raster_overscale_gate",
        "merged_vector_gate",
        "recompress_roundtrip",
    ):
        assert name in REGISTRY and REGISTRY[name].oracle is not None
