"""Header sniffing (functions/sniff.py): every container branch against
real encoder output where the codec exists, spec-built headers elsewhere,
and the Arrow-batched DataFrame API."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.codecs import encode_image, encode_png
from versatiles_rs_spark.functions.sniff import sniff_header, sniff_images
from versatiles_rs_spark.image_ctypes import HAS_GD_JPEG, HAS_WEBP


def _img(w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 3) % 256, (yy * 5) % 256, (xx + yy) % 256], -1).astype(np.uint8)


def test_png_real_encoder():
    assert sniff_header(encode_png(_img(37, 21))) == ("png", 37, 21)


@pytest.mark.skipif(not HAS_GD_JPEG, reason="libgd/libjpeg not present")
def test_jpeg_real_encoder():
    assert sniff_header(encode_image(_img(48, 31), "jpg", 85)) == ("jpg", 48, 31)


@pytest.mark.skipif(not HAS_WEBP, reason="libwebp not present")
def test_webp_vp8_and_vp8l():
    # lossy -> VP8 chunk
    assert sniff_header(encode_image(_img(40, 24), "webp", 80)) == ("webp", 40, 24)
    # q=100 routes to lossless -> VP8L chunk
    blob = encode_image(_img(33, 17), "webp", 100)
    assert blob[12:16] in (b"VP8L", b"VP8 ")
    assert sniff_header(blob) == ("webp", 33, 17)


def test_webp_vp8x_spec_header():
    # extended container: 24-bit minus-one canvas dims (WebP container spec)
    dims = (123 - 1).to_bytes(3, "little") + (456 - 1).to_bytes(3, "little")
    payload = b"WEBP" + b"VP8X" + struct.pack("<I", 10) + b"\x00" + b"\x00\x00\x00" + dims
    blob = b"RIFF" + struct.pack("<I", len(payload)) + payload
    assert sniff_header(blob) == ("webp", 123, 456)


def test_jpeg_progressive_sof2_and_marker_walk():
    # hand-built: SOI, APP0 (skipped via length), SOF2 with dims 300x200
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof2 = b"\xff\xc2" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 200, 300) + b"\x03"
    assert sniff_header(b"\xff\xd8" + app0 + sof2) == ("jpg", 300, 200)


def test_gif_and_bmp_spec_headers():
    assert sniff_header(b"GIF89a" + struct.pack("<HH", 640, 480) + b"\x00" * 4) == (
        "gif", 640, 480,
    )
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 800, -600) + b"\x00" * 8
    assert sniff_header(bmp) == ("bmp", 800, 600)  # negative h = top-down


def test_garbage_and_truncated():
    assert sniff_header(b"") == ("unknown", -1, -1)
    assert sniff_header(b"\x00\x01\x02\x03") == ("unknown", -1, -1)
    # PNG magic but truncated before IHDR dims
    assert sniff_header(b"\x89PNG\r\n\x1a\n\x00\x00\x00\rIHDR\x00\x01") == ("unknown", -1, -1)
    # JPEG SOI with no SOF before data ends
    assert sniff_header(b"\xff\xd8\xff\xe0\x00\x04\x00\x00") == ("jpg", -1, -1)


def test_sniff_images_dataframe(spark):
    pngs = [(i, encode_png(_img(16 + i, 20 + i))) for i in range(8)]
    df = spark.createDataFrame(pngs, "image_id long, bytes binary")
    out = {r.image_id: (r.sniff_fmt, r.sniff_w, r.sniff_h) for r in sniff_images(df).collect()}
    for i in range(8):
        assert out[i] == ("png", 16 + i, 20 + i)
    plan = sniff_images(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: sniff fuses into the scan side
