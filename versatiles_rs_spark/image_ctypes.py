"""Real JPEG / WebP codecs via ctypes over system libraries.

Parity targets (/root/reference/versatiles_image/src/format/):
jpeg.rs:36-74 (image crate's libjpeg-equivalent baseline codec),
webp.rs:32-91 (libwebp encode/decode).

No Python imaging package ships in this container, but the C libraries do:

- JPEG through **libgd** (`gdImageCreateFromJpegPtr` / `gdImageJpegPtr`,
  which wrap libjpeg62): the gd API is opaque-pointer only — no fragile
  struct layouts in ctypes. Pixels cross gd's boundary as PNG bytes, decoded
  and encoded by the engine's own spec-compliant pure-Python PNG codec
  (codecs.py) — lossless transport, so the only lossy step is JPEG itself.
- WebP through **libwebp** directly (`WebPDecodeRGBA` / `WebPEncodeRGBA`
  — a flat-pointer API).

Import-gated (`HAS_GD_JPEG`, `HAS_WEBP`): when the shared libraries are
missing, codecs.py falls back to the deterministic "vt-lossy" stand-ins.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np


def _load(candidates):
    for n in candidates:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


_GD = _load(["libgd.so.3", "libgd.so", ctypes.util.find_library("gd") or "libgd.so"])
_WEBP = _load(
    ["libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp") or "libwebp.so"]
)

HAS_GD_JPEG = _GD is not None
HAS_WEBP = _WEBP is not None

if HAS_GD_JPEG:
    _GD.gdImageCreateFromJpegPtr.restype = ctypes.c_void_p
    _GD.gdImageCreateFromJpegPtr.argtypes = [ctypes.c_int, ctypes.c_void_p]
    _GD.gdImageCreateFromBmpPtr.restype = ctypes.c_void_p
    _GD.gdImageCreateFromBmpPtr.argtypes = [ctypes.c_int, ctypes.c_void_p]
    _GD.gdImageJpegPtr.restype = ctypes.c_void_p
    _GD.gdImageJpegPtr.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    _GD.gdImageBmpPtr.restype = ctypes.c_void_p
    _GD.gdImageBmpPtr.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    _GD.gdImageDestroy.restype = None
    _GD.gdImageDestroy.argtypes = [ctypes.c_void_p]
    _GD.gdFree.restype = None
    _GD.gdFree.argtypes = [ctypes.c_void_p]

if HAS_WEBP:
    _WEBP.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    _WEBP.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _WEBP.WebPEncodeRGBA.restype = ctypes.c_size_t
    _WEBP.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
    ]
    _WEBP.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    _WEBP.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    _WEBP.WebPFree.restype = None
    _WEBP.WebPFree.argtypes = [ctypes.c_void_p]


# Pixel transport across the gd boundary is uncompressed 24-bit BMP: both
# sides parse/build it with flat numpy ops (PNG transport measured 28 ms per
# 64px decode — gd's adaptive PNG filters hit the pure-Python unfilter loop;
# BMP is ~0.1 ms).


def _bmp_encode(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    import struct

    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + h * stride, 0, 0, 54,
        40, w, h, 1, 24, 0, h * stride, 2835, 2835, 0, 0,
    )
    return header + rows.tobytes()


def _bmp_decode(data: bytes) -> np.ndarray:
    import struct

    off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp != 24:
        raise ValueError(f"unexpected BMP bpp {bpp}")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, np.uint8, count=h * stride, offset=off).reshape(h, stride)
    rgb = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return np.ascontiguousarray(rgb[::-1] if flip else rgb)


def jpeg_decode(data: bytes) -> np.ndarray:
    """JPEG bytes -> (H, W, 3) uint8 via gd, raw BMP as the transport."""
    if not HAS_GD_JPEG:
        raise NotImplementedError("libgd not available for JPEG decode")
    im = _GD.gdImageCreateFromJpegPtr(len(data), data)
    if not im:
        raise ValueError("invalid JPEG payload")
    try:
        size = ctypes.c_int(0)
        ptr = _GD.gdImageBmpPtr(im, ctypes.byref(size), 0)  # 0 = no RLE
        if not ptr:
            raise ValueError("gd BMP transport failed")
        try:
            bmp = ctypes.string_at(ptr, size.value)
        finally:
            _GD.gdFree(ptr)
    finally:
        _GD.gdImageDestroy(im)
    return _bmp_decode(bmp)


def jpeg_encode(img: np.ndarray, quality: int = 85) -> bytes:
    """(H, W, C) uint8 -> baseline JPEG bytes (alpha dropped; JPEG is RGB)."""
    if not HAS_GD_JPEG:
        raise NotImplementedError("libgd not available for JPEG encode")
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[2] == 2:  # LumaA -> RGB
        img = np.stack([img[:, :, 0]] * 3, axis=-1)
    bmp = _bmp_encode(np.ascontiguousarray(img[:, :, :3]))
    im = _GD.gdImageCreateFromBmpPtr(len(bmp), bmp)
    if not im:
        raise ValueError("gd failed to parse BMP transport bytes")
    try:
        size = ctypes.c_int(0)
        ptr = _GD.gdImageJpegPtr(im, ctypes.byref(size), int(quality))
        if not ptr:
            raise ValueError("gd JPEG encode failed")
        try:
            return ctypes.string_at(ptr, size.value)
        finally:
            _GD.gdFree(ptr)
    finally:
        _GD.gdImageDestroy(im)


def webp_decode(data: bytes) -> np.ndarray:
    """WebP bytes -> (H, W, 4) uint8 RGBA."""
    if not HAS_WEBP:
        raise NotImplementedError("libwebp not available")
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    ptr = _WEBP.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("invalid WebP payload")
    try:
        buf = ctypes.string_at(ptr, w.value * h.value * 4)
    finally:
        _WEBP.WebPFree(ptr)
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(h.value, w.value, 4)
    # alpha is lossless in WebP: an all-255 plane means the source was RGB —
    # return 3 channels like the reference's decode of RGB-encoded images
    if (arr[:, :, 3] == 255).all():
        return np.ascontiguousarray(arr[:, :, :3])
    return arr


def webp_encode(img: np.ndarray, quality: int = 85) -> bytes:
    """(H, W, C) uint8 -> WebP bytes; quality >= 100 selects lossless
    (webp.rs:61-66 quality-100 semantics)."""
    if not HAS_WEBP:
        raise NotImplementedError("libwebp not available")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c == 1:
        img = np.concatenate([img] * 3, axis=2)
    if c == 2:
        img = np.concatenate([img[:, :, :1]] * 3 + [img[:, :, 1:]], axis=2)
    if img.shape[2] == 3:
        img = np.concatenate(
            [img, np.full((h, w, 1), 255, np.uint8)], axis=2
        )
    rgba = np.ascontiguousarray(img, dtype=np.uint8).tobytes()
    out = ctypes.c_void_p()
    if quality >= 100:
        n = _WEBP.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    else:
        n = _WEBP.WebPEncodeRGBA(rgba, w, h, w * 4, float(quality), ctypes.byref(out))
    if not n or not out:
        raise ValueError("WebP encode failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        _WEBP.WebPFree(out)
