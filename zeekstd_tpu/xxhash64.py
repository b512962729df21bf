"""Streaming XXH64 implementation.

libzstd computes the per-frame Content_Checksum as the low 32 bits of
XXH64(frame content, seed=0) (RFC 8878 §3.1.1; exercised by the reference at
lib/src/encode.rs:863-869). The reference delegates this to libzstd; we
implement it natively. A C++ fast path lives in ``zeekstd_tpu.native`` and is
used automatically when available; this module is the portable fallback and
the reference implementation the native code is tested against.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M64, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M64


class XXH64:
    """Incremental XXH64 hasher (seeded)."""

    def __init__(self, seed: int = 0):
        self.seed = seed & _M64
        self.reset()

    def reset(self) -> None:
        seed = self.seed
        self._acc1 = (seed + _P1 + _P2) & _M64
        self._acc2 = (seed + _P2) & _M64
        self._acc3 = seed
        self._acc4 = (seed - _P1) & _M64
        self._buf = b""
        self._total = 0

    def update(self, data: bytes) -> None:
        self._total += len(data)
        data = self._buf + bytes(data)
        n_stripes = len(data) // 32
        a1, a2, a3, a4 = self._acc1, self._acc2, self._acc3, self._acc4
        if n_stripes:
            lanes = struct.unpack_from(f"<{n_stripes * 4}Q", data)
            for i in range(0, n_stripes * 4, 4):
                a1 = _round(a1, lanes[i])
                a2 = _round(a2, lanes[i + 1])
                a3 = _round(a3, lanes[i + 2])
                a4 = _round(a4, lanes[i + 3])
        self._acc1, self._acc2, self._acc3, self._acc4 = a1, a2, a3, a4
        self._buf = data[n_stripes * 32 :]

    def digest(self) -> int:
        if self._total >= 32:
            acc = (
                _rotl(self._acc1, 1)
                + _rotl(self._acc2, 7)
                + _rotl(self._acc3, 12)
                + _rotl(self._acc4, 18)
            ) & _M64
            acc = _merge_round(acc, self._acc1)
            acc = _merge_round(acc, self._acc2)
            acc = _merge_round(acc, self._acc3)
            acc = _merge_round(acc, self._acc4)
        else:
            acc = (self.seed + _P5) & _M64
        acc = (acc + self._total) & _M64

        buf = self._buf
        pos = 0
        while len(buf) - pos >= 8:
            (lane,) = struct.unpack_from("<Q", buf, pos)
            acc ^= _round(0, lane)
            acc = (_rotl(acc, 27) * _P1 + _P4) & _M64
            pos += 8
        if len(buf) - pos >= 4:
            (lane,) = struct.unpack_from("<I", buf, pos)
            acc ^= (lane * _P1) & _M64
            acc = (_rotl(acc, 23) * _P2 + _P3) & _M64
            pos += 4
        for b in buf[pos:]:
            acc ^= (b * _P5) & _M64
            acc = (_rotl(acc, 11) * _P1) & _M64

        acc ^= acc >> 33
        acc = (acc * _P2) & _M64
        acc ^= acc >> 29
        acc = (acc * _P3) & _M64
        acc ^= acc >> 32
        return acc


def xxh64(data: bytes, seed: int = 0) -> int:
    """One-shot XXH64. Prefers the native C++ implementation when built."""
    try:
        from .native import loader as _native

        lib = _native.get_lib()
        if lib is not None:
            return _native.xxh64(data, seed)
    except Exception:
        pass
    h = XXH64(seed)
    h.update(data)
    return h.digest()


def content_checksum(data: bytes) -> int:
    """Low 32 bits of XXH64(data, 0): the zstd frame Content_Checksum."""
    return xxh64(data, 0) & 0xFFFF_FFFF
