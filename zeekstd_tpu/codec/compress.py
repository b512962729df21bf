"""Frame compression: block splitting, literals/sequences encoding, checksum.

Host-path replacement for libzstd's ``ZSTD_compressStream2`` surface the
reference drives (reference: lib/src/encode.rs:341-345, SURVEY §2.3).
``CCtx`` mirrors the context semantics: parameters persist across
``reset_session``; ``ref_prefix`` applies to the next frame only.
"""

from __future__ import annotations

from ..constants import (
    DEFAULT_COMPRESSION_LEVEL,
    ZSTD_BLOCK_SIZE_MAX,
)
from ..xxhash64 import XXH64
from . import frame as frame_mod
from .block_compress import compress_block


class CCtx:
    """Compression context (parameters + per-frame state)."""

    def __init__(self):
        self.level = DEFAULT_COMPRESSION_LEVEL
        self.checksum = False
        self.window_log = 0  # 0 = derive from level/content
        self.ldm = False
        self._prefix: bytes | None = None

    def set_compression_level(self, level: int) -> None:
        self.level = level

    def set_checksum_flag(self, flag: bool) -> None:
        self.checksum = flag

    def set_window_log(self, wlog: int) -> None:
        self.window_log = wlog

    def set_enable_ldm(self, flag: bool) -> None:
        self.ldm = flag

    def ref_prefix(self, prefix: bytes) -> None:
        self._prefix = prefix

    def reset_session(self) -> None:
        self._prefix = None

    def take_prefix(self) -> bytes:
        p = self._prefix
        self._prefix = None
        return p if p is not None else b""

    def compress_frame(self, data: bytes) -> bytes:
        prefix = self.take_prefix()
        return compress_frame(
            data,
            level=self.level,
            checksum=self.checksum,
            prefix=prefix,
            window_log=self.window_log,
        )


def compress_frame(
    data: bytes,
    level: int = DEFAULT_COMPRESSION_LEVEL,
    checksum: bool = False,
    prefix: bytes = b"",
    window_log: int = 0,
) -> bytes:
    """Compress ``data`` into a single complete zstd frame."""
    if window_log == 0:
        # Window covers the whole input (frames are bounded by the seekable
        # frame-size policy, reference default 2 MiB: lib/src/encode.rs:36-38).
        need = max(len(data) + len(prefix), 1 << 10)
        window_log = min(need.bit_length() - (0 if need & (need - 1) else 1), 27)
    window_size = min(1 << window_log, max(len(data) + len(prefix), 1024))

    out = bytearray()
    out += frame_mod.write_frame_header(len(data), window_size, checksum)

    block_max = frame_mod.block_size_max(window_size)
    state = CompressState(data, prefix, level)

    if not data:
        out += frame_mod.write_block_header(True, frame_mod.BLOCK_RAW, 0)
    else:
        pos = 0
        while pos < len(data):
            size = min(block_max, len(data) - pos)
            last = pos + size == len(data)
            out += compress_block(state, pos, size, last)
            pos += size

    if checksum:
        h = XXH64(0)
        h.update(data)
        out += (h.digest() & 0xFFFF_FFFF).to_bytes(4, "little")
    return bytes(out)


class CompressState:
    """Per-frame encoder state shared across blocks: the concatenated
    prefix+data window, repeat-offset history, and carried entropy tables."""

    def __init__(self, data: bytes, prefix: bytes, level: int):
        from .match import params_for_level

        self.prefix_len = len(prefix)
        self.window = prefix + data  # match search space
        self.level = level
        self.params = params_for_level(level)
        self.rep_offsets = (1, 4, 8)
        self.huf_table = None  # carried for treeless-literal reuse
        self.match_state = None  # carried hash tables across blocks
