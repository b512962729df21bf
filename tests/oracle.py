"""ctypes bindings to the system libzstd, used ONLY as a test oracle.

The reference proves bit-compatibility against the independent C
implementation rather than by self-round-trip alone
(reference: lib/src/seek_table.rs:1156-1212). We follow the same strategy:
libzstd compresses inputs our decoder must decode, and decompresses outputs
our encoder produced. libzstd is never part of the framework itself.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_lib = None


def get_lib():
    global _lib
    if _lib is None:
        path = ctypes.util.find_library("zstd") or "libzstd.so.1"
        _lib = ctypes.CDLL(path)
        _lib.ZSTD_isError.restype = ctypes.c_uint
        _lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        _lib.ZSTD_getErrorName.restype = ctypes.c_char_p
        _lib.ZSTD_getErrorName.argtypes = [ctypes.c_size_t]
        _lib.ZSTD_compressBound.restype = ctypes.c_size_t
        _lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        _lib.ZSTD_createCCtx.restype = ctypes.c_void_p
        _lib.ZSTD_freeCCtx.argtypes = [ctypes.c_void_p]
        _lib.ZSTD_CCtx_setParameter.restype = ctypes.c_size_t
        _lib.ZSTD_CCtx_setParameter.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        _lib.ZSTD_compress2.restype = ctypes.c_size_t
        _lib.ZSTD_compress2.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        _lib.ZSTD_CCtx_refPrefix.restype = ctypes.c_size_t
        _lib.ZSTD_CCtx_refPrefix.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
        _lib.ZSTD_createDCtx.restype = ctypes.c_void_p
        _lib.ZSTD_freeDCtx.argtypes = [ctypes.c_void_p]
        _lib.ZSTD_DCtx_setParameter.restype = ctypes.c_size_t
        _lib.ZSTD_DCtx_setParameter.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        _lib.ZSTD_DCtx_refPrefix.restype = ctypes.c_size_t
        _lib.ZSTD_DCtx_refPrefix.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
        _lib.ZSTD_decompressDCtx.restype = ctypes.c_size_t
        _lib.ZSTD_decompressDCtx.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        _lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
        _lib.ZSTD_getFrameContentSize.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
        _lib.ZSTD_findFrameCompressedSize.restype = ctypes.c_size_t
        _lib.ZSTD_findFrameCompressedSize.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    return _lib


# ZSTD_cParameter values (zstd.h)
ZSTD_c_compressionLevel = 100
ZSTD_c_windowLog = 101
ZSTD_c_contentSizeFlag = 200
ZSTD_c_checksumFlag = 201
ZSTD_c_enableLongDistanceMatching = 160
# ZSTD_dParameter values
ZSTD_d_windowLogMax = 100


def _check(lib, code: int) -> int:
    if lib.ZSTD_isError(code):
        raise RuntimeError(lib.ZSTD_getErrorName(code).decode())
    return code


def zstd_compress(
    data: bytes,
    level: int = 3,
    checksum: bool = False,
    prefix: bytes | None = None,
    window_log: int = 0,
    content_size_flag: bool = True,
    ldm: bool = False,
) -> bytes:
    lib = get_lib()
    cctx = lib.ZSTD_createCCtx()
    try:
        _check(lib, lib.ZSTD_CCtx_setParameter(cctx, ZSTD_c_compressionLevel, level))
        _check(lib, lib.ZSTD_CCtx_setParameter(cctx, ZSTD_c_checksumFlag, int(checksum)))
        _check(
            lib,
            lib.ZSTD_CCtx_setParameter(cctx, ZSTD_c_contentSizeFlag, int(content_size_flag)),
        )
        if window_log:
            _check(lib, lib.ZSTD_CCtx_setParameter(cctx, ZSTD_c_windowLog, window_log))
        if ldm:
            _check(lib, lib.ZSTD_CCtx_setParameter(cctx, ZSTD_c_enableLongDistanceMatching, 1))
        if prefix is not None:
            _check(lib, lib.ZSTD_CCtx_refPrefix(cctx, prefix, len(prefix)))
        bound = lib.ZSTD_compressBound(len(data))
        out = ctypes.create_string_buffer(bound)
        n = _check(lib, lib.ZSTD_compress2(cctx, out, bound, data, len(data)))
        return out.raw[:n]
    finally:
        lib.ZSTD_freeCCtx(cctx)


def zstd_decompress(
    data: bytes,
    max_size: int = 1 << 28,
    prefix: bytes | None = None,
    window_log_max: int = 0,
) -> bytes:
    lib = get_lib()
    dctx = lib.ZSTD_createDCtx()
    try:
        if window_log_max:
            _check(lib, lib.ZSTD_DCtx_setParameter(dctx, ZSTD_d_windowLogMax, window_log_max))
        if prefix is not None:
            _check(lib, lib.ZSTD_DCtx_refPrefix(dctx, prefix, len(prefix)))
        out = ctypes.create_string_buffer(max_size)
        n = _check(lib, lib.ZSTD_decompressDCtx(dctx, out, max_size, data, len(data)))
        return out.raw[:n]
    finally:
        lib.ZSTD_freeDCtx(dctx)


def frame_compressed_size(data: bytes) -> int:
    lib = get_lib()
    return _check(lib, lib.ZSTD_findFrameCompressedSize(data, len(data)))
