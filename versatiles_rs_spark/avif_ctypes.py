"""AVIF codec via ctypes over the system libheif (AV1 through dav1d/aom).

The reference DECLARES an AVIF tile format but leaves decode unimplemented
(/root/reference/versatiles_image/src/format/avif.rs:79). This engine goes
further: system libheif ships with dav1d + aom backends, and its C API is
opaque-pointer (no fragile struct layouts beyond the by-value heif_error),
so real AVIF encode/decode comes from a stdlib-ctypes binding.

Import-gated (`HAS_AVIF`): absent libheif degrades to the documented
unsupported-format error, matching the reference's behavior.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile

import numpy as np


class _HeifError(ctypes.Structure):
    _fields_ = [
        ("code", ctypes.c_int),
        ("subcode", ctypes.c_int),
        ("message", ctypes.c_char_p),
    ]


def _load():
    for n in ("libheif.so.1", "libheif.so", ctypes.util.find_library("heif") or ""):
        if not n:
            continue
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


_H = _load()
HAS_AVIF = _H is not None

# heif.h enums
_COMPRESSION_AV1 = 4
_COLORSPACE_RGB = 1
_CHROMA_INTERLEAVED_RGB = 10
_CHROMA_INTERLEAVED_RGBA = 11
_CHANNEL_INTERLEAVED = 10

if HAS_AVIF:
    _H.heif_context_alloc.restype = ctypes.c_void_p
    _H.heif_context_free.argtypes = [ctypes.c_void_p]
    _H.heif_context_read_from_memory_without_copy.restype = _HeifError
    _H.heif_context_read_from_memory_without_copy.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
    ]
    _H.heif_context_get_primary_image_handle.restype = _HeifError
    _H.heif_context_get_primary_image_handle.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
    ]
    _H.heif_decode_image.restype = _HeifError
    _H.heif_decode_image.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
    ]
    _H.heif_image_handle_get_width.restype = ctypes.c_int
    _H.heif_image_handle_get_width.argtypes = [ctypes.c_void_p]
    _H.heif_image_handle_get_height.restype = ctypes.c_int
    _H.heif_image_handle_get_height.argtypes = [ctypes.c_void_p]
    _H.heif_image_get_plane_readonly.restype = ctypes.POINTER(ctypes.c_uint8)
    _H.heif_image_get_plane_readonly.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    _H.heif_image_release.argtypes = [ctypes.c_void_p]
    _H.heif_image_handle_release.argtypes = [ctypes.c_void_p]
    _H.heif_context_get_encoder_for_format.restype = _HeifError
    _H.heif_context_get_encoder_for_format.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
    ]
    _H.heif_encoder_set_lossy_quality.restype = _HeifError
    _H.heif_encoder_set_lossy_quality.argtypes = [ctypes.c_void_p, ctypes.c_int]
    _H.heif_encoder_set_lossless.restype = _HeifError
    _H.heif_encoder_set_lossless.argtypes = [ctypes.c_void_p, ctypes.c_int]
    _H.heif_encoder_release.argtypes = [ctypes.c_void_p]
    _H.heif_image_create.restype = _HeifError
    _H.heif_image_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    _H.heif_image_add_plane.restype = _HeifError
    _H.heif_image_add_plane.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    _H.heif_image_get_plane.restype = ctypes.POINTER(ctypes.c_uint8)
    _H.heif_image_get_plane.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    _H.heif_context_encode_image.restype = _HeifError
    _H.heif_context_encode_image.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    _H.heif_context_write_to_file.restype = _HeifError
    _H.heif_context_write_to_file.argtypes = [ctypes.c_void_p, ctypes.c_char_p]


def _check(err: _HeifError, what: str):
    if err.code != 0:
        msg = (err.message or b"?").decode("utf-8", "replace")
        raise ValueError(f"libheif {what} failed: {msg} (code {err.code})")


def avif_decode(data: bytes) -> np.ndarray:
    """AVIF bytes -> (H, W, 4) uint8 RGBA (3 channels if fully opaque)."""
    if not HAS_AVIF:
        raise NotImplementedError("libheif not available for AVIF decode")
    ctx = _H.heif_context_alloc()
    try:
        _check(
            _H.heif_context_read_from_memory_without_copy(ctx, data, len(data), None),
            "read",
        )
        handle = ctypes.c_void_p()
        _check(_H.heif_context_get_primary_image_handle(ctx, ctypes.byref(handle)), "handle")
        try:
            w = _H.heif_image_handle_get_width(handle)
            h = _H.heif_image_handle_get_height(handle)
            img = ctypes.c_void_p()
            _check(
                _H.heif_decode_image(
                    handle, ctypes.byref(img), _COLORSPACE_RGB,
                    _CHROMA_INTERLEAVED_RGBA, None,
                ),
                "decode",
            )
            try:
                stride = ctypes.c_int(0)
                p = _H.heif_image_get_plane_readonly(
                    img, _CHANNEL_INTERLEAVED, ctypes.byref(stride)
                )
                buf = ctypes.string_at(p, stride.value * h)
                rows = np.frombuffer(buf, np.uint8).reshape(h, stride.value)
                arr = rows[:, : w * 4].reshape(h, w, 4).copy()
            finally:
                _H.heif_image_release(img)
        finally:
            _H.heif_image_handle_release(handle)
    finally:
        _H.heif_context_free(ctx)
    if (arr[:, :, 3] == 255).all():
        return np.ascontiguousarray(arr[:, :, :3])
    return arr


def avif_encode(img: np.ndarray, quality: int = 85) -> bytes:
    """(H, W, C) uint8 -> AVIF bytes (AV1 via aom; quality >= 100 lossless)."""
    if not HAS_AVIF:
        raise NotImplementedError("libheif not available for AVIF encode")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c == 1:
        img = np.concatenate([img] * 3, axis=2)
    if c == 2:
        img = np.concatenate([img[:, :, :1]] * 3 + [img[:, :, 1:]], axis=2)
    # RGB input -> no alpha plane in the file (a lossy-coded constant-255
    # alpha would wobble on decode and masquerade as real transparency)
    nch = img.shape[2]
    chroma = _CHROMA_INTERLEAVED_RGBA if nch == 4 else _CHROMA_INTERLEAVED_RGB
    rgba = np.ascontiguousarray(img, dtype=np.uint8)

    ctx = _H.heif_context_alloc()
    try:
        enc = ctypes.c_void_p()
        _check(
            _H.heif_context_get_encoder_for_format(ctx, _COMPRESSION_AV1, ctypes.byref(enc)),
            "get encoder",
        )
        try:
            if quality >= 100:
                _check(_H.heif_encoder_set_lossless(enc, 1), "set lossless")
            else:
                _check(_H.heif_encoder_set_lossy_quality(enc, int(quality)), "set quality")
            him = ctypes.c_void_p()
            _check(
                _H.heif_image_create(
                    w, h, _COLORSPACE_RGB, chroma, ctypes.byref(him)
                ),
                "image create",
            )
            try:
                _check(
                    _H.heif_image_add_plane(him, _CHANNEL_INTERLEAVED, w, h, 8 * nch),
                    "add plane",
                )
                stride = ctypes.c_int(0)
                p = _H.heif_image_get_plane(him, _CHANNEL_INTERLEAVED, ctypes.byref(stride))
                src = rgba.tobytes()
                for row in range(h):
                    ctypes.memmove(
                        ctypes.addressof(p.contents) + row * stride.value,
                        src[row * w * nch : (row + 1) * w * nch],
                        w * nch,
                    )
                _check(
                    _H.heif_context_encode_image(ctx, him, enc, None, None),
                    "encode",
                )
            finally:
                _H.heif_image_release(him)
        finally:
            _H.heif_encoder_release(enc)
        fd, path = tempfile.mkstemp(suffix=".avif")
        os.close(fd)
        try:
            _check(_H.heif_context_write_to_file(ctx, path.encode()), "write")
            with open(path, "rb") as f:
                return f.read()
        finally:
            os.unlink(path)
    finally:
        _H.heif_context_free(ctx)
