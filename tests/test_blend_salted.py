"""Salted two-phase raster compositing: output parity + hot-cell spread."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark import fixtures
from versatiles_rs_spark.codecs import decode_image, encode_image
from versatiles_rs_spark.operators.stacked import blend_images_per_tile, blend_kernel


@pytest.fixture(scope="module")
def skewed_tiles(spark):
    """2000 opaque images, ~20% in one hot tile (fixtures skew contract)."""
    return fixtures.images_with_tiles_df(
        spark, 2000, size=16, zoom=6, partitions=8, skew=True
    ).select("image_id", "z", "x", "y", "bytes")


def test_salted_blend_matches_unsalted_opaque(spark, skewed_tiles):
    plain = blend_images_per_tile(skewed_tiles, order_col="image_id")
    salted = blend_images_per_tile(skewed_tiles, order_col="image_id", n_salts=8)
    a = {(r.z, r.x, r.y): bytes(r.bytes) for r in plain.collect()}
    b = {(r.z, r.x, r.y): bytes(r.bytes) for r in salted.collect()}
    assert a.keys() == b.keys()
    # opaque source-over = topmost image wins -> byte-identical results
    assert a == b


def test_salted_blend_translucent_close(spark):
    """With real alpha the integer rounding (+127//255) makes two-phase
    composition only near-exact: assert per-pixel closeness."""
    rows = []
    rng = np.random.default_rng(7)
    for i in range(40):
        img = rng.integers(0, 255, (8, 8, 4), dtype=np.uint8)
        img[..., 3] = 120  # translucent
        rows.append((f"i{i:03d}", 3, 1, 2, bytearray(encode_image(img, "png"))))
    df = spark.createDataFrame(rows, "image_id string, z long, x long, y long, bytes binary")
    plain = decode_image(bytes(blend_images_per_tile(df, "image_id").first().bytes))
    salted = decode_image(
        bytes(blend_images_per_tile(df, "image_id", n_salts=4).first().bytes)
    )
    assert plain.shape == salted.shape
    assert np.abs(plain.astype(int) - salted.astype(int)).max() <= 3


def test_salted_blend_order_matters_and_is_respected(spark):
    """Topmost (lowest order_col) opaque image must win in both paths."""
    imgs = [np.full((8, 8, 3), v, np.uint8) for v in (10, 200)]
    rows = [
        ("a", 3, 0, 0, bytearray(encode_image(imgs[0], "png"))),
        ("b", 3, 0, 0, bytearray(encode_image(imgs[1], "png"))),
    ]
    df = spark.createDataFrame(rows, "image_id string, z long, x long, y long, bytes binary")
    for n_salts in (0, 2):
        out = decode_image(
            bytes(blend_images_per_tile(df, "image_id", n_salts=n_salts).first().bytes)
        )
        assert (out[..., :3] == 10).all()


def test_stacked_raster_blend_translucent(spark):
    """stacked_raster_blend must match the premultiplied blend_kernel on
    semi-transparent lower layers (ADVICE r1: the old straight-alpha integer
    fold pulled color from fully transparent pixels)."""
    import numpy as np
    import pandas as pd

    from versatiles_rs_spark.codecs import decode_image, encode_image
    from versatiles_rs_spark.operators.stacked import blend_kernel, stacked_raster_blend

    rng = np.random.default_rng(7)
    top = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    top[..., 3] = 128  # semi-transparent upper layer
    low = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    low[..., 3] = 64  # semi-transparent lower layer w/ transparent pixels
    low[0:4, 0:4, 3] = 0  # fully transparent region: must contribute NOTHING
    mk = lambda img: spark.createDataFrame(
        pd.DataFrame({"z": [3], "x": [1], "y": [2], "bytes": [encode_image(img, "png")]}),
        schema="z long, x long, y long, bytes binary",
    )
    out = stacked_raster_blend([mk(top), mk(low)]).collect()
    assert len(out) == 1 and out[0].n_blended == 2
    got = decode_image(bytes(out[0].bytes))
    want = blend_kernel([top, low])
    assert np.array_equal(got, want)
