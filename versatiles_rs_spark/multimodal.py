"""Multimodal payload plumbing: image / audio / video as opaque binary
columns with typed metadata, processed by Arrow-batched kernels.

Design (project brief): media libraries (libjpeg, ffmpeg, ...) are NOT in
this container, so the *decode* steps are deterministic stand-ins or
clearly-marked stubs — but everything Spark-side is real and tested: schemas,
partitioning, mapInPandas batch shapes, metadata propagation.

- images: the engine PNG codec is real (codecs.py); resize is a real numpy
  kernel over decoded pixels.
- audio: payload modeled as int16 PCM bytes; loudness/duration kernels are
  real numpy; a compressed-codec decode raises NotImplementedError.
- video: payload modeled as a concatenation of fixed-size "frames";
  frame-sampling slices deterministically; a real-container demux raises
  NotImplementedError.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .codecs import decode_image, encode_image

MEDIA_META_SCHEMA = (
    "media_type string, codec string, width int, height int, "
    "sample_rate int, n_channels int, n_frames int"
)


def with_media_meta(df: DataFrame, payload: str = "bytes", fmt_col: str = "fmt") -> DataFrame:
    """Attach a typed metadata struct for a media payload column — the
    schema every multimodal operator agrees on."""
    return df.withColumn(
        "media",
        F.struct(
            F.lit("image").alias("media_type"),
            F.col(fmt_col).alias("codec"),
            F.col("w").alias("width"),
            F.col("h").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_channels"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )


# ---------------------------------------------------------------------------
# images
# ---------------------------------------------------------------------------


def resize_kernel(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (real kernel; the reference's resize filters
    live in versatiles_image/src/traits/operation.rs:107-125)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[yi][:, xi]


def image_resize(df: DataFrame, out_w: int, out_h: int, payload: str = "bytes") -> DataFrame:
    """Decode -> resize -> re-encode, Arrow-batched; w/h metadata updated."""
    schema = df.schema

    def run(batches):
        for pdf in batches:
            out = []
            for blob in pdf[payload]:
                img = resize_kernel(decode_image(bytes(blob)), out_w, out_h)
                out.append(encode_image(img, "png"))
            pdf = pdf.copy()
            pdf[payload] = pd.Series(out, index=pdf.index)
            if "w" in pdf:
                pdf["w"] = np.int32(out_w)
            if "h" in pdf:
                pdf["h"] = np.int32(out_h)
            yield pdf

    return df.mapInPandas(run, schema=schema)


def image_features(df: DataFrame, payload: str = "bytes") -> DataFrame:
    """Per-image feature extraction: mean/std per channel + 8x8 average-pool
    perceptual hash — real numpy over decoded pixels ("average color" parity,
    operation.rs:101-104)."""
    from .udfs import schema_with

    schema = schema_with(
        df.schema, ("mean_rgb", "array<double>"), ("std_rgb", "array<double>"), ("ahash", "bigint")
    )

    def run(batches):
        for pdf in batches:
            means, stds, hashes = [], [], []
            for blob in pdf[payload]:
                img = decode_image(bytes(blob)).astype(np.float64)
                means.append([float(m) for m in img.mean(axis=(0, 1))[:3]])
                stds.append([float(s) for s in img.std(axis=(0, 1))[:3]])
                g = img[..., :3].mean(axis=2)
                small = resize_kernel(g[:, :, None], 8, 8)[:, :, 0]
                bits = (small > small.mean()).flatten()
                hashes.append(int(np.int64(bits @ (1 << np.arange(64, dtype=np.uint64)).astype(np.int64))))
            pdf = pdf.copy()
            pdf["mean_rgb"], pdf["std_rgb"], pdf["ahash"] = means, stds, hashes
            yield pdf

    return df.mapInPandas(run, schema=schema)


def dct_phash_kernel(img: np.ndarray) -> int:
    """Classic DCT perceptual hash (pHash.org / python-imagehash
    algorithm) over REAL decoded pixels — the pixel-level companion of
    the input table's synthetic `phash` column: grayscale -> 32x32 ->
    2-D DCT-II -> 8x8 low-frequency block -> bit per coefficient above
    the block median (median computed EXCLUDING the DC term, so a
    uniform brightness shift flips at most the DC bit).  Returns int64;
    composes directly with functions/phash.py's pigeonhole blocking,
    which works on any 64-bit fingerprint."""
    g = img[..., :3].mean(axis=2) if img.ndim == 3 else img.astype(np.float64)
    g = resize_kernel(g[:, :, None].astype(np.float64), 32, 32)[:, :, 0]
    n = 32
    k = np.arange(n, dtype=np.float64)
    C = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    d = C @ g @ C.T
    block = d[:8, :8].flatten()
    med = np.median(block[1:])
    bits = block > med
    return int(
        np.int64(bits @ (1 << np.arange(64, dtype=np.uint64)).astype(np.int64))
    )


def image_phash(df: DataFrame, payload: str = "bytes") -> DataFrame:
    """Add a `dphash bigint` column: real-pixel DCT perceptual hash per
    image, one fused Arrow pass (decode once, no shuffle)."""
    from .udfs import schema_with

    schema = schema_with(df.schema, ("dphash", "bigint"))

    def run(batches):
        for pdf in batches:
            hashes = [
                dct_phash_kernel(decode_image(bytes(blob))) for blob in pdf[payload]
            ]
            pdf = pdf.copy()
            pdf["dphash"] = hashes
            yield pdf

    return df.mapInPandas(run, schema=schema)


def blur_kernel(gray: np.ndarray) -> float:
    """Variance of the 4-neighbor Laplacian — the standard cheap sharpness
    estimator (OpenCV's variance_of_laplacian): blurred images have weak
    second derivatives everywhere, so the variance collapses."""
    lap = (
        -4.0 * gray[1:-1, 1:-1]
        + gray[:-2, 1:-1]
        + gray[2:, 1:-1]
        + gray[1:-1, :-2]
        + gray[1:-1, 2:]
    )
    return float(lap.var())


def image_quality(df: DataFrame, payload: str = "bytes") -> DataFrame:
    """LAION-style image quality gates in ONE fused Arrow pass over the
    decoded pixels: `blur_score` (Laplacian variance — threshold low =
    drop blurry/flat), `luma_mean` / `luma_std` (exposure: near-0 or
    near-255 mean with tiny std = under/over-exposed or solid fill),
    `entropy` (8-bit histogram entropy — near-0 = synthetic flat fill).
    Payload enters Python once and the emitted columns are slim doubles;
    compose with the metadata/CLIP gates in the curation funnel."""
    from .udfs import schema_with

    schema = schema_with(
        df.schema,
        ("blur_score", "double"),
        ("luma_mean", "double"),
        ("luma_std", "double"),
        ("entropy", "double"),
    )

    def run(batches):
        for pdf in batches:
            blur, lm, ls, ent = [], [], [], []
            for blob in pdf[payload]:
                img = decode_image(bytes(blob)).astype(np.float64)
                g = img[..., :3].mean(axis=2)
                blur.append(blur_kernel(g))
                lm.append(float(g.mean()))
                ls.append(float(g.std()))
                hist = np.bincount(
                    np.clip(g, 0, 255).astype(np.int64).ravel(), minlength=256
                ).astype(np.float64)
                p = hist / hist.sum()
                nz = p[p > 0]
                ent.append(float(-(nz * np.log2(nz)).sum()))
            pdf = pdf.copy()
            pdf["blur_score"], pdf["luma_mean"] = blur, lm
            pdf["luma_std"], pdf["entropy"] = ls, ent
            yield pdf

    return df.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# audio (PCM stand-in; compressed decode stubbed)
# ---------------------------------------------------------------------------


def decode_audio(blob: bytes, codec: str) -> np.ndarray:
    """PCM16 payloads (raw or inside a RIFF/WAVE container) decode for
    real — stdlib struct + numpy, no audio libs; only compressed codecs
    (mp3/aac/opus/...) remain stubbed (project brief: STUB decode, keep
    the Spark plumbing real)."""
    if codec == "pcm16":
        return np.frombuffer(blob, dtype=np.int16).astype(np.float32) / 32768.0
    if codec == "wav":
        from .functions.sniff import sniff_wav

        h = sniff_wav(blob)
        if h is None or h["data_off"] < 0:
            raise ValueError("wav payload: no RIFF/WAVE data chunk")
        if h["audio_format"] != 1 or h["bits"] != 16:
            raise NotImplementedError(
                f"wav audio_format={h['audio_format']} bits={h['bits']}: only "
                "uncompressed PCM16 decodes without audio libs"
            )
        pcm = blob[h["data_off"] : h["data_off"] + h["data_len"]]
        x = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
        if h["channels"] > 1:  # downmix interleaved channels to mono
            n = len(x) // h["channels"] * h["channels"]
            x = x[:n].reshape(-1, h["channels"]).mean(axis=1)
        return x
    raise NotImplementedError(
        f"audio codec {codec!r}: no decoder in this environment — plug "
        "soundfile/ffmpeg here in production"
    )


def audio_features(
    df: DataFrame, payload: str = "audio", codec_col: str = "codec", sample_rate: int = 16000
) -> DataFrame:
    """Duration / RMS loudness / zero-crossing-rate per clip (real numpy)."""
    from .udfs import schema_with

    schema = schema_with(
        df.schema, ("duration_s", "double"), ("rms", "double"), ("zcr", "double")
    )

    def run(batches):
        for pdf in batches:
            dur, rms, zcr = [], [], []
            for blob, codec in zip(pdf[payload], pdf[codec_col]):
                x = decode_audio(bytes(blob), codec)
                dur.append(len(x) / sample_rate)
                rms.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
                zcr.append(float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0)
            pdf = pdf.copy()
            pdf["duration_s"], pdf["rms"], pdf["zcr"] = dur, rms, zcr
            yield pdf

    return df.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# video (frame-concatenation stand-in; real demux stubbed)
# ---------------------------------------------------------------------------


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    payload: str = "video",
    codec_col: str = "codec",
    frame_w: int = 16,
    frame_h: int = 16,
) -> DataFrame:
    """Explode every Nth frame of each clip into image rows
    (clip_id, frame_idx, bytes). 'rawframes' = concatenated frame_w*frame_h*3
    buffers decodes for real; container formats are stubbed."""
    frame_sz = frame_w * frame_h * 3
    out_schema = "clip_id string, frame_idx int, bytes binary"

    def run(batches):
        for pdf in batches:
            rows = []
            for cid, blob, codec in zip(pdf["clip_id"], pdf[payload], pdf[codec_col]):
                if codec != "rawframes":
                    raise NotImplementedError(
                        f"video codec {codec!r}: no demuxer in this environment — "
                        "plug pyav/ffmpeg here in production"
                    )
                buf = bytes(blob)
                n = len(buf) // frame_sz
                for i in range(0, n, every_n):
                    frame = np.frombuffer(
                        buf[i * frame_sz : (i + 1) * frame_sz], dtype=np.uint8
                    ).reshape(frame_h, frame_w, 3)
                    rows.append((cid, i, encode_image(frame, "png")))
            yield pd.DataFrame(rows, columns=["clip_id", "frame_idx", "bytes"])

    return df.mapInPandas(run, schema=out_schema)
