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


# ---------------------------------------------------------------------------
# audio/video container headers (no codec needed) — WAV/RIFF + ISO-BMFF MP4
# ---------------------------------------------------------------------------
# Public specs: RIFF/WAVE (Microsoft/IBM 1991 multimedia spec: 'fmt ' layout,
# 'data' chunk), ISO/IEC 14496-12 (box size/type framing, mvhd timescale+
# duration, tkhd 16.16 fixed-point width/height, hdlr handler_type).  The
# multimodal decode stubs stay decode-only: duration / rate / channels /
# dimensions come straight off the container bytes.


def sniff_wav(blob: bytes) -> dict | None:
    """Parse a RIFF/WAVE header: dict(kind='wav', audio_format, channels,
    sample_rate, bits, data_off, data_len, duration_ms) or None when not a
    WAV.  duration_ms computed from the data chunk byte length — no decode."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    out = {"kind": "wav", "audio_format": -1, "channels": -1,
           "sample_rate": -1, "bits": -1, "data_off": -1, "data_len": -1,
           "duration_ms": -1}
    pos = 12
    try:
        while pos + 8 <= len(blob):
            cid = blob[pos : pos + 4]
            sz = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
            body = pos + 8
            if cid == b"fmt ":
                fmt_tag, ch, rate = struct.unpack("<HHI", blob[body : body + 8])
                bits = struct.unpack("<H", blob[body + 14 : body + 16])[0]
                out.update(audio_format=fmt_tag, channels=ch,
                           sample_rate=rate, bits=bits)
            elif cid == b"data":
                out.update(data_off=body, data_len=sz)
            pos = body + sz + (sz & 1)  # RIFF chunks are word-aligned
    except (struct.error, IndexError):
        return None
    if out["sample_rate"] > 0 and out["data_len"] >= 0 and out["bits"] > 0 \
            and out["channels"] > 0:
        bytes_per_s = out["sample_rate"] * out["channels"] * out["bits"] // 8
        if bytes_per_s:
            out["duration_ms"] = out["data_len"] * 1000 // bytes_per_s
    return out


def _iter_boxes(buf: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) over ISO-BMFF sibling boxes."""
    while pos + 8 <= end:
        sz = struct.unpack(">I", buf[pos : pos + 4])[0]
        typ = buf[pos + 4 : pos + 8]
        body = pos + 8
        if sz == 1:  # 64-bit largesize
            sz = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif sz == 0:  # box extends to end of file
            sz = end - pos
        if sz < 8 or pos + sz > end:
            return
        yield typ, body, pos + sz
        pos += sz


def sniff_mp4(blob: bytes) -> dict | None:
    """Parse ISO-BMFF (MP4/MOV) structure: dict(kind='mp4', brand,
    duration_ms, width, height, n_tracks, has_video, has_audio) or None.
    Width/height from the first video trak's tkhd (16.16 fixed point);
    duration from mvhd duration/timescale.  Box walk only — no codec."""
    boxes = list(_iter_boxes(blob, 0, len(blob)))
    if not boxes or boxes[0][0] != b"ftyp":
        return None
    out = {"kind": "mp4", "brand": blob[boxes[0][1] : boxes[0][1] + 4].decode("ascii", "replace"),
           "duration_ms": -1, "width": -1, "height": -1,
           "n_tracks": 0, "has_video": False, "has_audio": False}
    try:
        for typ, body, bend in boxes:
            if typ != b"moov":
                continue
            for t2, b2, e2 in _iter_boxes(blob, body, bend):
                if t2 == b"mvhd":
                    ver = blob[b2]
                    if ver == 1:
                        ts = struct.unpack(">I", blob[b2 + 20 : b2 + 24])[0]
                        dur = struct.unpack(">Q", blob[b2 + 24 : b2 + 32])[0]
                    else:
                        ts, dur = struct.unpack(">II", blob[b2 + 12 : b2 + 20])
                    if ts:
                        out["duration_ms"] = dur * 1000 // ts
                elif t2 == b"trak":
                    out["n_tracks"] += 1
                    w = h = -1
                    handler = b""
                    for t3, b3, e3 in _iter_boxes(blob, b2, e2):
                        if t3 == b"tkhd":
                            ver = blob[b3]
                            # width/height: last 8 bytes of the box, 16.16
                            w = struct.unpack(">I", blob[e3 - 8 : e3 - 4])[0] >> 16
                            h = struct.unpack(">I", blob[e3 - 4 : e3])[0] >> 16
                        elif t3 == b"mdia":
                            for t4, b4, e4 in _iter_boxes(blob, b3, e3):
                                if t4 == b"hdlr":
                                    handler = blob[b4 + 8 : b4 + 12]
                    if handler == b"vide":
                        out["has_video"] = True
                        if w > 0 and out["width"] < 0:
                            out["width"], out["height"] = w, h
                    elif handler == b"soun":
                        out["has_audio"] = True
    except (struct.error, IndexError):
        return None
    return out


def sniff_media(
    df: DataFrame, bytes_col: str = "bytes", id_col: str = "media_id"
) -> DataFrame:
    """(id, media_kind, duration_ms, sample_rate, channels, width, height,
    n_tracks) per row — the audio/video analog of sniff_images; Arrow-batched,
    slim emit, no shuffle.  Unknown containers report kind='unknown'."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[bytes_col]):
                blob = bytes(b)
                got = sniff_wav(blob) or sniff_mp4(blob)
                if got is None:
                    rows.append((mid, "unknown", -1, -1, -1, -1, -1, 0))
                elif got["kind"] == "wav":
                    rows.append((mid, "wav", got["duration_ms"],
                                 got["sample_rate"], got["channels"], -1, -1, 1))
                else:
                    rows.append((mid, "mp4", got["duration_ms"], -1, -1,
                                 got["width"], got["height"], got["n_tracks"]))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "media_kind", "duration_ms", "sample_rate",
                         "channels", "width", "height", "n_tracks"],
            )

    id_type = dict(df.dtypes)[id_col]
    return df.mapInPandas(
        kernel,
        schema=(
            f"{id_col} {id_type}, media_kind string, duration_ms long, "
            "sample_rate int, channels int, width int, height int, n_tracks int"
        ),
    )
