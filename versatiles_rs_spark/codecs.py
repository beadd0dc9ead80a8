"""Payload codecs: raster encode/decode + blob compression.

Parity targets (/root/reference/versatiles_image/src/format/): png.rs:26-77,
jpeg.rs:36-74, webp.rs:32-91; compression functions
versatiles_core/src/utils/compression/functions.rs:55,141-200.

Codec inventory (no Python imaging package here, but system C libs exist):

- **PNG is a real, spec-compliant codec** (stdlib zlib + struct): RGB8 /
  RGBA8 / Luma8 / LumaA8, filter-0 encode, full 5-filter decode. Lossless,
  round-trip exact — mirrors png.rs supporting exactly those pixel types
  (operation.rs:92-98).
- **JPG / WEBP are real codecs** via ctypes over system libgd/libwebp
  (image_ctypes.py) — baseline JPEG and full WebP incl. lossless. When the
  shared libraries are absent the deterministic "vt-lossy" stand-ins
  (magic + quality-quantized pixels + zlib) remain as the gated fallback,
  and legacy vt-lossy payloads still decode.
- Compression: gzip (stdlib) real; brotli real via ctypes over system
  libbrotli (brotli_ctypes.py) — the reference's full {none, gzip, brotli}
  enum.
"""

from __future__ import annotations

import gzip as _gzip
import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_LOSSY_MAGIC = {b"VTJ1": "jpg", b"VTW1": "webp"}
_LOSSY_TAG = {"jpg": b"VTJ1", "jpeg": b"VTJ1", "webp": b"VTW1"}

# PNG color types by channel count (1=Luma8, 2=LumaA8, 3=RGB8, 4=RGBA8)
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}
_CHANNELS = {0: 1, 4: 2, 2: 3, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode HxWxC (or HxW) uint8 array as PNG (filter type 0 rows)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c} (operation.rs:92-98 semantics)")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    raw = np.ascontiguousarray(img, dtype=np.uint8)
    # prepend filter byte 0 to each scanline
    rows = np.zeros((h, 1 + w * c), dtype=np.uint8)
    rows[:, 1:] = raw.reshape(h, w * c)
    idat = zlib.compress(rows.tobytes(), compress_level)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def median_cut_palette(pixels: np.ndarray, n_colors: int = 256):
    """Deterministic Heckbert median-cut: (N, C) uint8 pixels -> (K<=n,
    C) uint8 palette.  Every step has a total order: boxes split by
    largest pixel count (first index on ties), along the widest channel
    (lowest on ties), at the weighted median of a lexicographic sort;
    entries are count-weighted means with half-up integer rounding; the
    final palette is lexicographically sorted (np.unique).  No RNG, no
    k-means init — two runs on the same pixels are byte-identical."""
    colors, counts = np.unique(pixels.reshape(-1, pixels.shape[-1]), axis=0, return_counts=True)
    boxes = [(colors, counts)]
    while len(boxes) < n_colors:
        sizes = [c.sum() if len(c) > 1 else 0 for _, c in boxes]
        b = int(np.argmax(sizes))
        if sizes[b] == 0:  # nothing splittable left
            break
        cols, cnts = boxes[b]
        spread = cols.max(axis=0).astype(np.int32) - cols.min(axis=0)
        ch = int(np.argmax(spread))
        order = np.lexsort(tuple(cols[:, k] for k in range(cols.shape[1] - 1, -1, -1) if k != ch) + (cols[:, ch],))
        cols, cnts = cols[order], cnts[order]
        half = cnts.sum() / 2.0
        cut = int(np.searchsorted(np.cumsum(cnts), half)) + 1
        cut = min(max(cut, 1), len(cols) - 1)
        boxes[b] = (cols[:cut], cnts[:cut])
        boxes.append((cols[cut:], cnts[cut:]))
    pal = np.array(
        [
            (
                (cols.astype(np.uint64) * cnts[:, None].astype(np.uint64)).sum(axis=0)
                + np.uint64(int(cnts.sum()) // 2)
            )
            // np.uint64(cnts.sum())
            for cols, cnts in boxes
        ],
        dtype=np.uint8,
    )
    return np.unique(pal, axis=0)


def nearest_palette_index(pixels: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Exact nearest palette entry per pixel (squared distance, lowest
    index on ties — argmin is first-match)."""
    flat = pixels.reshape(-1, pixels.shape[-1]).astype(np.int32)
    d = ((flat[:, None, :] - palette[None, :, :].astype(np.int32)) ** 2).sum(axis=2)
    return d.argmin(axis=1).astype(np.uint8)


def encode_png8(img: np.ndarray, n_colors: int = 256, compress_level: int = 6) -> bytes:
    """Palette (color type 3) PNG — the pngquant/tile-server "PNG8"
    path: median-cut quantize to <=n_colors, PLTE (+tRNS when the image
    has alpha), 1 byte/pixel scanlines.  Gray promotes to RGB, LumaA to
    RGBA (PLTE is RGB by spec).  Typically 2-4x smaller than RGB8 for
    map tiles at visually-lossless error."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    elif img.shape[2] == 2:
        img = np.concatenate([np.repeat(img[:, :, :1], 3, axis=2), img[:, :, 1:]], axis=2)
    h, w, c = img.shape
    pal = median_cut_palette(img, n_colors)
    idx = nearest_palette_index(img, pal).reshape(h, w)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    chunks = _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal[:, :3].tobytes())
    if c == 4:
        chunks += _chunk(b"tRNS", pal[:, 3].tobytes())
    rows = np.zeros((h, 1 + w), dtype=np.uint8)
    rows[:, 1:] = idx
    chunks += _chunk(b"IDAT", zlib.compress(rows.tobytes(), compress_level))
    return PNG_SIG + chunks + _chunk(b"IEND", b"")


def _paeth(a, b, c):
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(blob: bytes) -> np.ndarray:
    """Decode PNG -> HxWxC uint8. Supports 8-bit gray/gray-a/rgb/rgba,
    non-interlaced, all 5 scanline filters."""
    if blob[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color_type = None
    idat = b""
    plte = trns = None
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    c = 1 if color_type == 3 else _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * c)
    filters = raw[:, 0]
    data = raw[:, 1:].reshape(h, w, c).copy()
    prev = np.zeros((w, c), dtype=np.uint8)
    for r in range(h):
        f = filters[r]
        row = data[r]
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(1, w):
                row[x] += row[x - 1]
        elif f == 2:  # Up
            row += prev
        elif f == 3:  # Average
            row[0] += (prev[0] >> 1).astype(np.uint8)
            for x in range(1, w):
                row[x] += ((row[x - 1].astype(np.int16) + prev[x]) >> 1).astype(np.uint8)
        elif f == 4:  # Paeth
            row[0] += _paeth(np.zeros(c, np.uint8), prev[0], np.zeros(c, np.uint8))
            for x in range(1, w):
                row[x] += _paeth(row[x - 1], prev[x], prev[x - 1])
        else:
            raise ValueError(f"bad filter {f}")
        prev = row
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        idx = data[:, :, 0]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            pal = np.concatenate([plte, alpha[:, None]], axis=1)
        else:
            pal = plte
        return pal[idx]
    return data


def encode_lossy(img: np.ndarray, fmt: str, quality: int = 85) -> bytes:
    """STUB lossy codec (no libjpeg/libwebp in this container).

    Deterministic quality-controlled quantization: step = max(1, (101-q)//8),
    values snapped to step midpoints, zlib-packed. Real lossy behavior
    (PSNR decreases with quality) with a trivial container; replace with
    Pillow `Image.save(..., quality=q)` in production (format/jpeg.rs:36-74).
    """
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    step = max(1, (101 - int(quality)) // 8)
    q = (img.astype(np.int32) // step) * step + step // 2
    q = np.clip(q, 0, 255).astype(np.uint8)
    payload = zlib.compress(q.tobytes(), 6)
    return _LOSSY_TAG[fmt] + struct.pack(">HHBB", w, h, c, step) + payload


def decode_lossy(blob: bytes) -> np.ndarray:
    w, h, c, _step = struct.unpack(">HHBB", blob[4:10])
    return np.frombuffer(zlib.decompress(blob[10:]), dtype=np.uint8).reshape(h, w, c).copy()


def detect_format(blob: bytes) -> str:
    """Sniff payload format from magic bytes (tile_format.rs:97-123 assigns
    formats explicitly; we sniff for robustness)."""
    if blob[:8] == PNG_SIG:
        return "png"
    if blob[:3] == b"\xff\xd8\xff":
        return "jpg"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        return "webp"
    if blob[4:12] in (b"ftypavif", b"ftypavis"):
        return "avif"
    if blob[:4] in _LOSSY_MAGIC:
        return _LOSSY_MAGIC[blob[:4]]  # legacy vt-lossy stand-in payloads
    if blob[:2] == b"\x1f\x8b":
        return "gzip"
    return "bin"


try:  # real JPEG/WebP via system libgd/libwebp (image_ctypes); else stand-ins
    from .image_ctypes import HAS_GD_JPEG, HAS_WEBP, jpeg_decode, jpeg_encode, webp_decode, webp_encode
except Exception:  # pragma: no cover - load failure counts as absent
    HAS_GD_JPEG = HAS_WEBP = False

    def _codec_unavailable(*a, **k):
        raise ValueError("jpeg/webp codec unavailable (image_ctypes failed to load)")

    jpeg_decode = jpeg_encode = webp_decode = webp_encode = _codec_unavailable

try:  # real AVIF via system libheif (beyond the reference: avif.rs:79 is a stub)
    from .avif_ctypes import HAS_AVIF, avif_decode, avif_encode
except Exception:  # pragma: no cover
    HAS_AVIF = False


def encode_image(img: np.ndarray, fmt: str, quality: int = 90) -> bytes:
    # default quality 90: measured floor for the BASELINE row invariant
    # (PSNR >= 40 dB) on 16px lossy->lossy chains with the real webp codec
    fmt = fmt.lower()
    if fmt == "png":
        return encode_png(img)
    if fmt in ("jpg", "jpeg"):
        return jpeg_encode(img, quality) if HAS_GD_JPEG else encode_lossy(img, fmt, quality)
    if fmt == "webp":
        return webp_encode(img, quality) if HAS_WEBP else encode_lossy(img, fmt, quality)
    if fmt == "avif" and HAS_AVIF:
        return avif_encode(img, quality)
    raise ValueError(f"unsupported format {fmt} (reference's own avif decode is unimplemented, avif.rs:79)")


def decode_image(blob: bytes) -> np.ndarray:
    fmt = detect_format(blob)
    if fmt == "png":
        return decode_png(blob)
    if fmt == "jpg" and blob[:3] == b"\xff\xd8\xff":
        if not HAS_GD_JPEG:
            raise ValueError("real JPEG blob but libgd/libjpeg unavailable")
        return jpeg_decode(blob)
    if fmt == "webp" and blob[:4] == b"RIFF":
        if not HAS_WEBP:
            raise ValueError("real WebP blob but libwebp unavailable")
        return webp_decode(blob)
    if fmt == "avif" and HAS_AVIF:
        return avif_decode(blob)
    if fmt in ("jpg", "webp"):
        return decode_lossy(blob)  # legacy vt-lossy payloads
    raise ValueError(f"cannot decode format {fmt}")


# ---------------------------------------------------------------------------
# DEM elevation encodings (TileSchema RasterDEM{Mapbox,Terrarium},
# tile_schema.rs:31-50) — public formulas:
#   mapbox:    h = (R*65536 + G*256 + B) * 0.1 - 10000
#   terrarium: h = (R*256 + G + B/256) - 32768
# ---------------------------------------------------------------------------


def encode_dem(heights: np.ndarray, schema: str = "mapbox") -> np.ndarray:
    """Elevations (H, W) float -> RGB uint8 (H, W, 3)."""
    h = np.asarray(heights, dtype=np.float64)
    if schema == "mapbox":
        v = np.clip(np.round((h + 10000.0) / 0.1), 0, 2**24 - 1).astype(np.uint32)
        r = (v >> 16) & 0xFF
        g = (v >> 8) & 0xFF
        b = v & 0xFF
    elif schema == "terrarium":
        v = np.clip(h + 32768.0, 0, 2**16 - 1 + 255 / 256)
        whole = np.floor(v)
        r = (whole.astype(np.uint32) >> 8) & 0xFF
        g = whole.astype(np.uint32) & 0xFF
        b = np.round((v - whole) * 256).astype(np.uint32) & 0xFF
    else:
        raise ValueError(f"unknown DEM schema {schema}")
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def decode_dem(rgb: np.ndarray, schema: str = "mapbox") -> np.ndarray:
    """RGB uint8 (H, W, 3) -> elevations (H, W) float64."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    if schema == "mapbox":
        return (r * 65536.0 + g * 256.0 + b) * 0.1 - 10000.0
    if schema == "terrarium":
        return (r * 256.0 + g + b / 256.0) - 32768.0
    raise ValueError(f"unknown DEM schema {schema}")


# ---------------------------------------------------------------------------
# blob compression (compression/functions.rs:141-200)
# ---------------------------------------------------------------------------

try:  # python-brotli if present; else stdlib-ctypes binding of libbrotli
    import brotli as _brotli  # type: ignore

    HAS_BROTLI = True
    _br_compress, _br_decompress = _brotli.compress, _brotli.decompress
except ImportError:
    from .brotli_ctypes import HAS_BROTLI
    from .brotli_ctypes import compress as _br_compress
    from .brotli_ctypes import decompress as _br_decompress


def compress_blob(data: bytes, codec: str) -> bytes:
    if codec in ("none", "uncompressed", None):
        return data
    if codec == "gzip":
        return _gzip.compress(data, compresslevel=6, mtime=0)  # deterministic
    if codec == "brotli":
        if not HAS_BROTLI:
            raise NotImplementedError("brotli not available in this environment")
        return _br_compress(data)
    raise ValueError(f"unknown codec {codec}")


def decompress_blob(data: bytes, codec: str) -> bytes:
    if codec in ("none", "uncompressed", None):
        return data
    if codec == "gzip":
        return _gzip.decompress(data)
    if codec == "brotli":
        if not HAS_BROTLI:
            raise NotImplementedError("brotli not available in this environment")
        return _br_decompress(data)
    raise ValueError(f"unknown codec {codec}")


def optimize_compression(blob: bytes, codec: str, accepted: set[str]) -> tuple[bytes, str]:
    """Serve-path content negotiation (compression/functions.rs:70-85):
    a COMPRESSED payload keeps its codec when the client accepts it; an
    UNCOMPRESSED payload is compressed to the best accepted codec
    (brotli > gzip, encoding.rs preference order); otherwise decompress and
    recompress minimally, identity always acceptable."""
    acc = {"brotli" if a.lower() == "br" else a.lower() for a in accepted}
    cur = "none" if codec in (None, "none") else codec
    if cur != "none" and cur in acc:
        return blob, cur
    raw = decompress_blob(blob, cur)
    for target in ("brotli", "gzip"):
        if target in acc and (target != "brotli" or HAS_BROTLI):
            return compress_blob(raw, target), target
    return raw, "none"


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio (dB) — the per-row invariant metric
    (BASELINE.json: decoded-pixel PSNR >= 40 dB for lossy)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
