"""Image header sniffing: format + pixel dimensions from leading bytes only.

The web-scale ingestion validation gate: before spending decode time (or
shipping a blob anywhere), read its dimensions and real format straight from
the container header — PNG IHDR, JPEG SOFn scan, WebP VP8/VP8L/VP8X, GIF
logical screen, BMP info header.  All header layouts are public file-format
specs (PNG RFC 2083 §11.2.2, JPEG ITU-T T.81 B.2.2, WebP container spec,
GIF89a spec, BMP BITMAPINFOHEADER).  At 10^12 images this replaces a full
decode (~0.14 ms/img, BENCH.md per-image budget) with a ~100-byte peek, and
catches mislabeled/truncated payloads (`fmt` column lies; headers don't).

Spark shape: one Arrow-batched mapInPandas emitting only (id, fmt, w, h,
ok) — the blob is consumed in the same Python task that holds it (compose
with sources/arrow_scan.py so payload bytes cross into Python exactly once
and never reach the JVM).  No shuffle anywhere.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

# SOFn markers that carry frame dimensions (T.81 B.2.2) — all C0-CF except
# C4 (DHT), C8 (JPG extension), CC (DAC)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def sniff_header(blob: bytes) -> tuple[str, int, int]:
    """(fmt, width, height) from the container header; ("unknown", -1, -1)
    when no known magic matches or the header is truncated."""
    try:
        if blob[:8] == b"\x89PNG\r\n\x1a\n" and blob[12:16] == b"IHDR":
            w, h = struct.unpack(">II", blob[16:24])
            return "png", w, h
        if blob[:3] == b"\xff\xd8\xff":
            i, n = 2, len(blob)
            while i + 9 < n:
                if blob[i] != 0xFF:
                    break
                marker = blob[i + 1]
                if marker == 0xFF:  # fill byte
                    i += 1
                    continue
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone marker, no length
                    continue
                seg_len = struct.unpack(">H", blob[i + 2 : i + 4])[0]
                if marker in _JPEG_SOF:
                    h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
                    return "jpg", w, h
                if marker == 0xDA:  # SOS: entropy data follows, no SOF seen
                    break
                i += 2 + seg_len
            return "jpg", -1, -1
        if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
            chunk = blob[12:16]
            if chunk == b"VP8 ":  # lossy: 14-bit dims after the frame tag
                if blob[23:26] != b"\x9d\x01\x2a":
                    return "webp", -1, -1
                w = struct.unpack("<H", blob[26:28])[0] & 0x3FFF
                h = struct.unpack("<H", blob[28:30])[0] & 0x3FFF
                return "webp", w, h
            if chunk == b"VP8L":  # lossless: packed 14-bit minus-one dims
                if blob[20] != 0x2F:
                    return "webp", -1, -1
                bits = struct.unpack("<I", blob[21:25])[0]
                return "webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
            if chunk == b"VP8X":  # extended: 24-bit minus-one canvas dims
                w = int.from_bytes(blob[24:27], "little") + 1
                h = int.from_bytes(blob[27:30], "little") + 1
                return "webp", w, h
            return "webp", -1, -1
        if blob[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", blob[6:10])
            return "gif", w, h
        if blob[:2] == b"BM":
            w, h = struct.unpack("<ii", blob[18:26])
            return "bmp", w, abs(h)  # negative height = top-down rows
    except (struct.error, IndexError):
        pass
    return "unknown", -1, -1


def sniff_images(df: DataFrame, bytes_col: str = "bytes", id_col: str = "image_id") -> DataFrame:
    """(id, sniff_fmt, sniff_w, sniff_h) for every row — Arrow-batched, no
    shuffle; emit is slim so the payload never leaves this stage."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = [sniff_header(bytes(b)) for b in pdf[bytes_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sniff_fmt": [o[0] for o in out],
                    "sniff_w": [o[1] for o in out],
                    "sniff_h": [o[2] for o in out],
                }
            )

    id_type = dict(df.dtypes)[id_col]
    return df.mapInPandas(
        kernel,
        schema=f"{id_col} {id_type}, sniff_fmt string, sniff_w int, sniff_h int",
    )
