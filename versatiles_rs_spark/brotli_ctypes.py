"""Brotli codec via ctypes over the system libbrotli (RFC 7932).

The Python `brotli` package is absent in this environment, but the C
libraries (`libbrotlienc`, `libbrotlidec`) ship with the OS — a stdlib
ctypes binding gives real spec-compliant brotli both ways, which the
`.versatiles` container REQUIRES: its block index and per-block tile
indices are mandatorily brotli-compressed
(/root/reference/versatiles_container/src/container/versatiles/types/
block_index.rs:63, tile_index.rs:65, writer.rs:19).

Import-gated like the other optional codecs: `HAS_BROTLI` is False when the
shared libraries are missing and callers fall back to the engine's
documented NotImplementedError gate.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_DEC = _ENC = None


def _load(kind: str):
    names = [f"libbrotli{kind}.so.1", f"libbrotli{kind}.so"]
    lib = ctypes.util.find_library(f"brotli{kind}")
    if lib:
        names.insert(0, lib)
    for n in names:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


_DEC = _load("dec")
_ENC = _load("enc")
HAS_BROTLI = _DEC is not None and _ENC is not None

if HAS_BROTLI:
    _DEC.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
    _DEC.BrotliDecoderCreateInstance.argtypes = [ctypes.c_void_p] * 3
    _DEC.BrotliDecoderDecompressStream.restype = ctypes.c_int
    _DEC.BrotliDecoderDecompressStream.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    _DEC.BrotliDecoderDestroyInstance.restype = None
    _DEC.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
    _ENC.BrotliEncoderMaxCompressedSize.restype = ctypes.c_size_t
    _ENC.BrotliEncoderMaxCompressedSize.argtypes = [ctypes.c_size_t]
    _ENC.BrotliEncoderCompress.restype = ctypes.c_int
    _ENC.BrotliEncoderCompress.argtypes = [
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_size_t,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_char_p,
    ]

# BrotliDecoderResult
_RES_ERROR, _RES_SUCCESS, _RES_NEEDS_INPUT, _RES_NEEDS_OUTPUT = 0, 1, 2, 3


def decompress(data: bytes) -> bytes:
    """Streaming decode (handles outputs of unknown size)."""
    if not HAS_BROTLI:
        raise NotImplementedError("libbrotlidec not available")
    state = _DEC.BrotliDecoderCreateInstance(None, None, None)
    if not state:
        raise MemoryError("BrotliDecoderCreateInstance failed")
    try:
        chunks = []
        in_buf = (ctypes.c_uint8 * max(len(data), 1)).from_buffer_copy(data or b"\x00")
        avail_in = ctypes.c_size_t(len(data))
        next_in = ctypes.cast(in_buf, ctypes.POINTER(ctypes.c_uint8))
        out_size = 1 << 18
        out_buf = (ctypes.c_uint8 * out_size)()
        total = ctypes.c_size_t(0)
        while True:
            avail_out = ctypes.c_size_t(out_size)
            next_out = ctypes.cast(out_buf, ctypes.POINTER(ctypes.c_uint8))
            res = _DEC.BrotliDecoderDecompressStream(
                state,
                ctypes.byref(avail_in),
                ctypes.byref(next_in),
                ctypes.byref(avail_out),
                ctypes.byref(next_out),
                ctypes.byref(total),
            )
            produced = out_size - avail_out.value
            if produced:
                chunks.append(bytes(out_buf[:produced]))
            if res == _RES_SUCCESS:
                return b"".join(chunks)
            if res == _RES_NEEDS_OUTPUT:
                continue
            if res == _RES_NEEDS_INPUT:
                raise ValueError("truncated brotli stream")
            raise ValueError("invalid brotli stream")
    finally:
        _DEC.BrotliDecoderDestroyInstance(state)


def compress(data: bytes, quality: int = 5, lgwin: int = 22) -> bytes:
    """One-shot encode (quality 5 ~ the reference's compress_brotli_fast,
    versatiles_core/src/utils/compression/functions.rs)."""
    if not HAS_BROTLI:
        raise NotImplementedError("libbrotlienc not available")
    max_out = _ENC.BrotliEncoderMaxCompressedSize(len(data)) or (len(data) + 1024)
    out = ctypes.create_string_buffer(max_out)
    out_len = ctypes.c_size_t(max_out)
    ok = _ENC.BrotliEncoderCompress(
        quality, lgwin, 0, len(data), data, ctypes.byref(out_len), out
    )
    if not ok:
        raise ValueError("brotli compression failed")
    return out.raw[: out_len.value]
