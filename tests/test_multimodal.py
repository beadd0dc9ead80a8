"""Multimodal plumbing: schemas, batch shapes, real kernels, stub gates."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark import fixtures
from versatiles_rs_spark.codecs import decode_image, encode_image
from versatiles_rs_spark.multimodal import (
    audio_features,
    decode_audio,
    image_features,
    image_resize,
    resize_kernel,
    sample_frames,
    with_media_meta,
)


@pytest.fixture(scope="module")
def images(spark):
    return fixtures.images_df(spark, 40, size=16, partitions=2)


def test_media_meta_schema(spark, images):
    df = with_media_meta(images)
    row = df.select("media.*").first()
    assert row.media_type == "image" and row.width == 16 and row.sample_rate is None


def test_resize_kernel_exact():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    up = resize_kernel(img, 8, 8)
    assert up.shape == (8, 8, 3)
    assert (up[::2, ::2] == img).all()  # nearest-neighbor grid
    down = resize_kernel(up, 4, 4)
    assert (down == img).all()


def test_image_resize_distributed(spark, images):
    out = image_resize(images, 8, 8)
    rows = out.collect()
    assert all(r.w == 8 and r.h == 8 for r in rows)
    assert all(decode_image(bytes(r.bytes)).shape == (8, 8, 3) for r in rows[:5])


def test_image_features(spark, images):
    out = image_features(images).select("image_id", "mean_rgb", "std_rgb", "ahash")
    rows = out.collect()
    assert len(rows) == 40
    for r in rows[:5]:
        assert len(r.mean_rgb) == 3 and all(0 <= m <= 255 for m in r.mean_rgb)
    # deterministic: same image id -> same ahash across runs
    again = image_features(images).select("image_id", "ahash").collect()
    assert {r.image_id: r.ahash for r in rows} == {r.image_id: r.ahash for r in again}


def test_audio_pcm_features(spark):
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    sine = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    rows = [("a1", sine.tobytes(), "pcm16"), ("a2", np.zeros(sr // 2, np.int16).tobytes(), "pcm16")]
    df = spark.createDataFrame(rows, "clip_id string, audio binary, codec string")
    out = {r.clip_id: r for r in audio_features(df, sample_rate=sr).collect()}
    assert abs(out["a1"].duration_s - 1.0) < 1e-9
    assert abs(out["a1"].rms - (20000 / 32768) / np.sqrt(2)) < 0.01
    assert out["a2"].rms == 0.0


def test_audio_compressed_decode_is_stubbed():
    with pytest.raises(NotImplementedError, match="audio codec"):
        decode_audio(b"\x00\x01", "opus")


def test_video_frame_sampling(spark):
    fw = fh = 16
    frames = [np.full((fh, fw, 3), i, np.uint8) for i in range(25)]
    blob = b"".join(f.tobytes() for f in frames)
    df = spark.createDataFrame(
        [("v1", blob, "rawframes")], "clip_id string, video binary, codec string"
    )
    out = sample_frames(df, every_n=10, frame_w=fw, frame_h=fh).collect()
    assert [r.frame_idx for r in sorted(out, key=lambda r: r.frame_idx)] == [0, 10, 20]
    img = decode_image(bytes(sorted(out, key=lambda r: r.frame_idx)[1].bytes))
    assert (img == 10).all()


def test_video_container_demux_is_stubbed(spark):
    df = spark.createDataFrame(
        [("v1", b"\x00", "mp4")], "clip_id string, video binary, codec string"
    )
    with pytest.raises(Exception, match="video codec"):
        sample_frames(df).collect()


def test_image_quality_gates(spark):
    """Blur score separates sharp from box-blurred, exposure stats flag
    solid fills, entropy flags synthetic flatness — on real encoded PNGs
    through the fused decode pass."""
    import numpy as np
    import pandas as pd

    from versatiles_rs_spark.codecs import encode_image
    from versatiles_rs_spark.multimodal import blur_kernel, image_quality

    rng = np.random.default_rng(7)
    sharp = (rng.integers(0, 256, (64, 64, 3))).astype(np.uint8)  # white noise: max detail
    g = sharp.astype(np.float64)
    k = 5  # heavy box blur
    blurred = np.cumsum(np.cumsum(g, axis=0), axis=1)
    pad = np.zeros((64 + 1, 64 + 1, 3))
    pad[1:, 1:] = blurred
    box = (pad[k:, k:] - pad[:-k, k:] - pad[k:, :-k] + pad[:-k, :-k]) / (k * k)
    blurred_img = np.clip(box, 0, 255).astype(np.uint8)
    solid = np.full((64, 64, 3), 250, dtype=np.uint8)  # near-white fill

    pdf = pd.DataFrame(
        {
            "id": [0, 1, 2],
            "bytes": [
                encode_image(sharp, "png"),
                encode_image(blurred_img, "png"),
                encode_image(solid, "png"),
            ],
        }
    )
    df = spark.createDataFrame(pdf, schema="id long, bytes binary")
    rows = {r.id: r for r in image_quality(df).collect()}
    assert rows[0].blur_score > 10 * rows[1].blur_score  # sharp >> blurred
    assert rows[2].blur_score == 0.0 and rows[2].luma_std == 0.0
    assert rows[2].luma_mean == 250.0 and rows[2].entropy == 0.0
    assert rows[0].entropy > 7.0  # white noise: near-8-bit-max entropy
    # kernel parity with a direct numpy evaluation
    assert abs(rows[0].blur_score - blur_kernel(sharp.astype(np.float64).mean(axis=2))) < 1e-9


def test_dct_phash_invariances(spark):
    """Real-pixel DCT pHash: identical images hash identically; a uniform
    brightness shift flips at most the DC bit; an unrelated image is far
    (near 32 of 64 bits)."""
    import numpy as np
    import pandas as pd

    from versatiles_rs_spark.codecs import encode_image
    from versatiles_rs_spark.multimodal import dct_phash_kernel, image_phash

    rng = np.random.default_rng(13)
    base = rng.integers(0, 200, (48, 48, 3)).astype(np.uint8)
    brighter = np.clip(base.astype(np.int64) + 40, 0, 255).astype(np.uint8)
    other = rng.integers(0, 200, (48, 48, 3)).astype(np.uint8)

    h_base = dct_phash_kernel(base)
    assert h_base == dct_phash_kernel(base.copy())
    d_bright = bin(h_base ^ dct_phash_kernel(brighter)).count("1")
    assert d_bright <= 4  # brightness shift barely moves the hash
    d_other = bin(h_base ^ dct_phash_kernel(other)).count("1")
    assert d_other >= 16

    # through Spark: fused pass adds dphash, values match the kernel
    rows = [(i, bytes(encode_image(img, "png")))
            for i, img in enumerate([base, brighter, other])]
    df = spark.createDataFrame(rows, "image_id long, bytes binary")
    got = {r["image_id"]: r["dphash"] for r in image_phash(df).collect()}
    assert got[0] == h_base
    assert got[1] == dct_phash_kernel(brighter)
    plan = image_phash(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one fused pass, no shuffle
