"""Build-on-demand loader for the native runtime (ctypes bindings).

Compiles ``zeekstd_native.cpp`` with the system g++ on first use and caches
the shared object next to the source (invalidated by source mtime). All
entry points degrade gracefully: ``get_lib()`` returns None when no
compiler is available, and callers fall back to the Python/JAX paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None
_tried = False
_scratch = bytearray(0)  # reused output buffer (per-call allocs cost ~30%)


def _get_scratch(cap: int):
    global _scratch
    if len(_scratch) < cap:
        _scratch = bytearray(cap + cap // 2)
    return _scratch

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "zeekstd_native.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libzeekstd_native.so")


def _build() -> bool:
    try:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return True
        # -O2 measures ~10% faster than -O3 here: the codec's branchy
        # loops lose from aggressive auto-vectorization.
        cmd = [
            "g++", "-O2", "-march=native", "-shared", "-fPIC", "-pthread",
            "-o", _SO, _SRC,
        ]
        res = subprocess.run(cmd, capture_output=True, timeout=180)
        return res.returncode == 0 and os.path.exists(_SO)
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        lib = ctypes.CDLL(_SO)
        lib.zn_xxh64.restype = ctypes.c_uint64
        lib.zn_xxh64.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_uint64]
        lib.zn_compress_frame.restype = ctypes.c_size_t
        lib.zn_compress_frame.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_size_t,
        ]
        lib.zn_decompress_frame.restype = ctypes.c_int64
        lib.zn_decompress_frame.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.zn_set_mt_level.restype = None
        lib.zn_set_mt_level.argtypes = [ctypes.c_int]
        lib.zn_set_ldm.restype = None
        lib.zn_set_ldm.argtypes = [ctypes.c_int]
        lib.zn_compress_stream_mt.restype = ctypes.c_int64
        lib.zn_compress_stream_mt.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.zn_decompress_stream_mt.restype = ctypes.c_int64
        lib.zn_decompress_stream_mt.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_size_t, ctypes.c_int,
        ]
        lib.zn_stream_new.restype = ctypes.c_void_p
        lib.zn_stream_new.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.zn_stream_free.restype = None
        lib.zn_stream_free.argtypes = [ctypes.c_void_p]
        lib.zn_stream_header.restype = ctypes.c_int64
        lib.zn_stream_header.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
        ]
        lib.zn_stream_block.restype = ctypes.c_int64
        lib.zn_stream_block.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t,
        ]
        lib.zn_stream_end.restype = ctypes.c_int64
        lib.zn_stream_end.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
        ]
        lib.zn_huf_table.restype = ctypes.c_int64
        lib.zn_huf_table.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.zn_fse_enc_table.restype = ctypes.c_int
        lib.zn_fse_enc_table.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.zn_huf_stream_decode.restype = ctypes.c_int
        lib.zn_huf_stream_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_size_t,
        ]
        _lib = lib
        return _lib


def huf_table(hist):
    """(tree_bytes, codes uint32[256], nbits uint8[256]) for a 256-bin
    literal histogram, or None (native unavailable / not encodable)."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    h = np.ascontiguousarray(hist, np.uint32)
    tree = ctypes.create_string_buffer(512)
    codes = np.zeros(256, np.uint32)
    nb = np.zeros(256, np.uint8)
    r = lib.zn_huf_table(
        h.ctypes.data, tree, 512, codes.ctypes.data, nb.ctypes.data
    )
    if r < 0:
        return None
    return tree.raw[:r], codes, nb


def huf_stream_decode(stream: bytes, sym, nbt, max_bits: int, out_len: int):
    """Decode one Huffman literal stream with a prebuilt direct table
    (symbol/nbits uint8 arrays of size 1 << max_bits); returns the
    decoded bytes as a numpy uint8 array, or None (native unavailable /
    malformed stream — the caller falls back to the Python decoder)."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    s = np.frombuffer(stream, np.uint8)
    sy = np.ascontiguousarray(sym, np.uint8)
    nb = np.ascontiguousarray(nbt, np.uint8)
    out = np.empty(out_len, np.uint8)
    r = lib.zn_huf_stream_decode(
        s.ctypes.data if len(s) else 0, len(s),
        sy.ctypes.data, nb.ctypes.data, int(max_bits),
        out.ctypes.data, out_len,
    )
    if r != 0:
        return None
    return out


def fse_enc_table(norm, accuracy_log: int):
    """(delta_nb int32[64], delta_fs int32[64], state_table uint16[512])
    or None."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    n = np.ascontiguousarray(norm, np.int16)
    dnb = np.zeros(64, np.int32)
    dfs = np.zeros(64, np.int32)
    stt = np.zeros(512, np.uint16)
    r = lib.zn_fse_enc_table(
        n.ctypes.data, len(n), accuracy_log,
        dnb.ctypes.data, dfs.ctypes.data, stt.ctypes.data,
    )
    if r != 0:
        return None
    return dnb, dfs, stt


class StreamCtx:
    """Handle for the native streaming frame context (one compressed
    block per call — the FrameSizePolicy::Compressed engine)."""

    STREAM_DCAP = 1 << 24  # declared window; frames must cut here

    def __init__(self, level: int, checksum: bool):
        self._lib = get_lib()
        self._h = self._lib.zn_stream_new(level, 1 if checksum else 0)

    def header(self) -> bytes:
        buf = ctypes.create_string_buffer(16)
        r = self._lib.zn_stream_header(self._h, buf, 16)
        if r < 0:
            raise RuntimeError("zn_stream_header failed")
        return buf.raw[:r]

    def block(self, data: bytes) -> bytes:
        cap = len(data) + len(data) // 2 + 1024
        buf = ctypes.create_string_buffer(cap)
        r = self._lib.zn_stream_block(self._h, bytes(data), len(data), buf, cap)
        if r < 0:
            raise RuntimeError("zn_stream_block failed")
        return buf.raw[:r]

    def end(self) -> bytes:
        buf = ctypes.create_string_buffer(16)
        r = self._lib.zn_stream_end(self._h, buf, 16)
        if r < 0:
            raise RuntimeError("zn_stream_end failed")
        return buf.raw[:r]

    def close(self) -> None:
        if self._h:
            self._lib.zn_stream_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def available() -> bool:
    return get_lib() is not None


def xxh64(data: bytes, seed: int = 0) -> int:
    lib = get_lib()
    return lib.zn_xxh64(bytes(data), len(data), seed)


def compress_frame(data: bytes, checksum: bool = False, prefix: bytes = b"", level: int = 1, ldm: bool = False) -> bytes:
    lib = get_lib()
    cap = len(data) + len(data) // 2 + 1024
    dst = ctypes.create_string_buffer(cap)
    lib.zn_set_ldm(int(ldm))
    try:
        r = lib.zn_compress_frame(
            bytes(data), len(data), dst, cap, level, int(checksum),
            bytes(prefix) if prefix else None, len(prefix),
        )
    finally:
        if ldm:
            lib.zn_set_ldm(0)
    if r == ctypes.c_size_t(-1).value:
        raise RuntimeError("native compress failed")
    return dst.raw[:r]


def decompress_frame(data: bytes, max_size: int, prefix: bytes = b""):
    """Returns (output, consumed). Raises on error; checksum mismatch raises
    with 'checksum' in the message."""
    lib = get_lib()
    dst = ctypes.create_string_buffer(max_size)
    consumed = ctypes.c_size_t(0)
    r = lib.zn_decompress_frame(
        bytes(data), len(data), dst, max_size,
        bytes(prefix) if prefix else None, len(prefix),
        ctypes.byref(consumed),
    )
    if r == -2:
        raise RuntimeError("native decompress: checksum mismatch")
    if r < 0:
        raise RuntimeError("native decompress failed")
    return dst.raw[:r], consumed.value


def compress_stream_mt(data: bytes, frame_size: int, checksum: bool = False, nthreads: int = 0, level: int = 1):
    """Compress all frames in parallel; returns (blob, [frame_sizes])."""
    lib = get_lib()
    lib.zn_set_mt_level(level)
    n = len(data)
    nframes = -(-n // frame_size) if n else 0
    cap = n + n // 2 + 4096 + 16 * max(nframes, 1)
    dst = _get_scratch(cap)
    dst_p = (ctypes.c_char * len(dst)).from_buffer(dst)
    sizes = (ctypes.c_uint32 * max(nframes, 1))()
    r = lib.zn_compress_stream_mt(
        bytes(data), n, dst_p, cap, frame_size, int(checksum), nthreads, sizes
    )
    del dst_p
    if r < 0:
        raise RuntimeError("native stream compress failed")
    return bytes(memoryview(dst)[:r]), [sizes[i] for i in range(nframes)]


def decompress_stream_mt(blob: bytes, frame_offsets, frame_dst_offsets, nthreads: int = 0, into=None):
    """Decompress frames in parallel given compressed/decompressed offsets
    (from the seek table).

    With ``into`` (a writable bytearray of at least the decompressed size)
    output lands directly in the caller's buffer and the byte count is
    returned — the io.Write-style surface, with no extra copy. Without it,
    a fresh ``bytes`` is returned.
    """
    lib = get_lib()
    nframes = len(frame_offsets) - 1
    total = frame_dst_offsets[-1]
    if into is not None and len(into) < total:
        raise ValueError("into buffer smaller than decompressed size")
    dst = into if into is not None else _get_scratch(max(total, 1))
    dst_p = (ctypes.c_char * len(dst)).from_buffer(dst)
    fo = (ctypes.c_uint64 * len(frame_offsets))(*frame_offsets)
    do = (ctypes.c_uint64 * len(frame_dst_offsets))(*frame_dst_offsets)
    r = lib.zn_decompress_stream_mt(
        bytes(blob), len(blob), dst_p, max(total, 1), fo, do, nframes, nthreads
    )
    del dst_p
    if r < 0:
        raise RuntimeError("native stream decompress failed")
    if into is not None:
        return r
    return bytes(memoryview(dst)[:r])
