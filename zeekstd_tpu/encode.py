"""Streaming seekable encoder: frame-size policies, RawEncoder, Encoder.

Mirrors the reference's encode layer (reference: lib/src/encode.rs):

- ``FrameSizePolicy`` — when to cut frames: by uncompressed size (default
  2 MiB) or by compressed size (reference: lib/src/encode.rs:15-39).
- ``EncodeOptions`` — builder carrying the compression context/parameters
  (reference: lib/src/encode.rs:94-207).
- ``RawEncoder`` — reusable caller-driven streaming encoder producing
  compressed bytes + a seek table (reference: lib/src/encode.rs:209-545).
- ``Encoder`` — single-use writer-backed wrapper whose ``finish()`` appends
  the serialized seek table (reference: lib/src/encode.rs:547-800).

Differences from the reference are deliberate, not omissions: the Rust
raw layer's explicit ``CompressionProgress``/``EpilogueProgress`` contract
exists because no_std callers own fixed buffers; here ``compress`` returns
the produced bytes and the resumable unit is the frame. The TPU parallel
path (``zeekstd_tpu.parallel``) compresses many frames at once and logs
them into the same ``SeekTable``.
"""

from __future__ import annotations

from dataclasses import dataclass

from .codec.compress import CCtx, FrameEncoder
from .constants import (
    DEFAULT_COMPRESSION_LEVEL,
    DEFAULT_FRAME_SIZE,
    SEEKABLE_MAX_FRAME_SIZE,
)
from .errors import NumberConversionError
from .seek_table import Format, SeekTable


@dataclass(frozen=True)
class FrameSizePolicy:
    """Frame-cutting policy (reference: lib/src/encode.rs:15-39).

    ``kind='uncompressed'``: start a new frame once the current one holds
    ``size`` uncompressed bytes (default, 2 MiB).
    ``kind='compressed'``: start a new frame once the current one's
    compressed payload reaches ``size`` bytes.
    The 1 GiB hard cap always applies (reference: lib/src/encode.rs:17-19).
    """

    kind: str
    size: int

    def __post_init__(self):
        if self.kind not in ("compressed", "uncompressed"):
            raise ValueError(f"unknown frame size policy kind {self.kind!r}")
        if not 0 < self.size <= SEEKABLE_MAX_FRAME_SIZE:
            raise NumberConversionError(
                f"frame size {self.size} out of range (1..{SEEKABLE_MAX_FRAME_SIZE})"
            )

    @classmethod
    def uncompressed(cls, size: int = DEFAULT_FRAME_SIZE) -> "FrameSizePolicy":
        return cls("uncompressed", size)

    @classmethod
    def compressed(cls, size: int) -> "FrameSizePolicy":
        return cls("compressed", size)


class EncodeOptions:
    """Builder for encoders (reference: lib/src/encode.rs:94-207).

    Checksums default OFF in the library (reference: lib/src/encode.rs:146)
    and are enabled explicitly by the CLI (reference: cli/src/compress.rs:41).

    ``backend``: "auto" (native C++ runtime when available for the fast
    levels, else Python), "python", or "native".
    """

    def __init__(self, cctx: CCtx | None = None):
        self.cctx = cctx if cctx is not None else CCtx()
        self.frame_size_policy = FrameSizePolicy.uncompressed()
        self.checksum_flag = False
        self.compression_level = DEFAULT_COMPRESSION_LEVEL
        self.backend = "auto"

    def with_backend(self, backend: str) -> "EncodeOptions":
        if backend not in ("auto", "python", "native"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        return self

    def with_cctx(self, cctx: CCtx) -> "EncodeOptions":
        self.cctx = cctx
        return self

    def with_frame_size_policy(self, policy: FrameSizePolicy) -> "EncodeOptions":
        self.frame_size_policy = policy
        return self

    def with_checksum_flag(self, flag: bool) -> "EncodeOptions":
        self.checksum_flag = flag
        return self

    def with_compression_level(self, level: int) -> "EncodeOptions":
        self.compression_level = level
        return self

    def into_raw_encoder(self) -> "RawEncoder":
        return RawEncoder(self)

    def into_encoder(self, writer) -> "Encoder":
        return Encoder(self, writer)


class RawEncoder:
    """Reusable streaming seekable encoder (reference: lib/src/encode.rs:209-545).

    ``compress()`` returns compressed bytes as frames fill per the policy;
    ``end_frame()`` force-closes the current frame; ``finish_seek_table()``
    is NOT part of this layer — callers serialize via
    ``into_seek_table().into_serializer()`` exactly as in the reference
    (lib/src/lib.rs:112-119).
    """

    def __init__(self, options: EncodeOptions | None = None):
        self.options = options if options is not None else EncodeOptions()
        self.cctx = self.options.cctx
        self.cctx.set_compression_level(self.options.compression_level)
        self.cctx.set_checksum_flag(self.options.checksum_flag)
        self._seek_table = SeekTable()
        self._frame: FrameEncoder | None = None
        self._frame_c_size = 0
        self._frame_d_size = 0
        self._prefix: bytes | None = None

    # -- internal ----------------------------------------------------------

    def _policy_window_log(self) -> int:
        pol = self.options.frame_size_policy
        if pol.kind == "uncompressed":
            need = max(pol.size, 1 << 10)
            log = need.bit_length() - (0 if need & (need - 1) else 1)
            return min(log, 27)
        return 24  # compressed policy: uncompressed size unknown upfront

    def _use_native(self) -> bool:
        if self.options.backend == "python":
            return False
        pol = self.options.frame_size_policy
        if pol.kind == "compressed":
            return False  # needs progressive compressed-size feedback
        if self.options.backend == "native":
            return True
        # auto: the native runtime serves every level (greedy, lazy, and
        # hash-chain strategies; levels 1-13 at or below libzstd's size on
        # text, 17+ trail its optimal parser — a planned upgrade). The
        # Python reference path stays available via backend="python".
        from .native import loader

        return loader.available()

    def _begin_frame(self) -> None:
        prefix = self._prefix if self._prefix is not None else b""
        pol = self.options.frame_size_policy
        if self._use_native():
            from .native.frame import NativeFrameEncoder

            self._frame = NativeFrameEncoder(
                checksum=self.cctx.checksum, prefix=prefix,
                level=self.cctx.level, ldm=self.cctx.ldm,
            )
            self._frame_c_size = 0
            self._frame_d_size = 0
            return
        # Compressed-size policy needs fine-grained block flushes so the
        # cut threshold is observable as the frame grows.
        block_size = max(pol.size // 4, 1024) if pol.kind == "compressed" else None
        self._frame = FrameEncoder(
            level=self.cctx.level,
            checksum=self.cctx.checksum,
            prefix=prefix,
            window_log=max(self.cctx.window_log, 0) or self._policy_window_log(),
            block_size=block_size,
            enable_ldm=self.cctx.ldm,
        )
        self._frame_c_size = 0
        self._frame_d_size = 0

    def _remaining_frame_size(self) -> int:
        """Uncompressed bytes until an auto frame cut
        (reference: lib/src/encode.rs:528-535)."""
        pol = self.options.frame_size_policy
        if pol.kind == "uncompressed":
            return min(pol.size, SEEKABLE_MAX_FRAME_SIZE) - self._frame_d_size
        return SEEKABLE_MAX_FRAME_SIZE - self._frame_d_size

    def _is_frame_complete(self) -> bool:
        """(reference: lib/src/encode.rs:537-544)"""
        pol = self.options.frame_size_policy
        if pol.kind == "compressed" and self._frame_c_size >= pol.size:
            return True
        return self._remaining_frame_size() <= 0

    # -- public API --------------------------------------------------------

    def compress(self, data) -> bytes:
        return self.compress_with_prefix(data, None)

    def compress_with_prefix(self, data, prefix) -> bytes:
        """Compress ``data``, cutting frames per the policy; the optional
        prefix is re-applied at every frame start
        (reference: lib/src/encode.rs:311-355)."""
        if prefix is not None:
            self._prefix = bytes(prefix)
        data = memoryview(bytes(data) if not isinstance(data, (bytes, memoryview)) else data)
        out = bytearray()
        pos = 0
        pol = self.options.frame_size_policy
        while pos < len(data):
            if self._frame is None:
                self._begin_frame()
            take = min(len(data) - pos, self._remaining_frame_size())
            if pol.kind == "compressed":
                # Feed block-by-block so the threshold check below sees the
                # compressed size advance (reference checks after each
                # compress_stream2 step: lib/src/encode.rs:317-327).
                take = min(take, self._frame.block_max)
            if take > 0:
                produced = self._frame.compress(bytes(data[pos : pos + take]))
                self._frame_c_size += len(produced)
                self._frame_d_size += take
                out += produced
                pos += take
            if self._is_frame_complete():
                out += self._end_frame_internal()
        return bytes(out)

    def end_frame(self) -> bytes:
        """Close the current frame and log it in the seek table
        (reference: lib/src/encode.rs:438-472)."""
        return self._end_frame_internal()

    def _end_frame_internal(self) -> bytes:
        if self._frame is None:
            return b""
        tail = self._frame.finish()
        self._frame_c_size += len(tail)
        self._seek_table.log_frame(self._frame_c_size, self._frame_d_size)
        self._frame = None
        self._frame_c_size = 0
        self._frame_d_size = 0
        return tail

    def reset_frame(self) -> None:
        """Drop in-progress frame state, keep parameters and seek table
        (reference: lib/src/encode.rs:501-507)."""
        self._frame = None
        self._frame_c_size = 0
        self._frame_d_size = 0

    def reset_seek_table(self) -> None:
        """(reference: lib/src/encode.rs:524-526)"""
        self._seek_table = SeekTable()

    def seek_table(self) -> SeekTable:
        return self._seek_table

    def into_seek_table(self) -> SeekTable:
        st = self._seek_table
        self.reset_frame()
        return st

    @property
    def frame_progress(self) -> tuple[int, int]:
        """(uncompressed, compressed) bytes of the in-progress frame —
        the pythonic stand-in for CompressionProgress
        (reference: lib/src/encode.rs:41-92)."""
        return self._frame_d_size, self._frame_c_size


class Encoder:
    """Single-use writer-backed seekable encoder
    (reference: lib/src/encode.rs:547-800). Implements the file-object
    ``write``/``flush`` protocol the way the reference implements
    ``io::Write`` (lib/src/encode.rs:791-800)."""

    def __init__(self, options: EncodeOptions | None = None, writer=None):
        if writer is None:
            raise ValueError("Encoder requires a writer")
        self.raw = RawEncoder(options)
        self._writer = writer
        self._written = 0
        self._finished = False

    @classmethod
    def new(cls, writer) -> "Encoder":
        return cls(EncodeOptions(), writer)

    def compress(self, data) -> int:
        return self.compress_with_prefix(data, None)

    def compress_with_prefix(self, data, prefix) -> int:
        chunk = self.raw.compress_with_prefix(data, prefix)
        self._writer.write(chunk)
        self._written += len(chunk)
        return len(data)

    def end_frame(self) -> int:
        chunk = self.raw.end_frame()
        self._writer.write(chunk)
        self._written += len(chunk)
        return len(chunk)

    def finish(self, fmt: Format = Format.FOOT) -> int:
        """End the last frame, serialize the seek table to the writer, and
        return the total bytes written (reference: lib/src/encode.rs:743-775)."""
        assert not self._finished
        self.end_frame()
        table = self.raw.seek_table().to_bytes(fmt)
        self._writer.write(table)
        self._written += len(table)
        self._finished = True
        return self._written

    def written_compressed(self) -> int:
        """(reference: lib/src/encode.rs:614-617)"""
        return self._written

    def seek_table(self) -> SeekTable:
        return self.raw.seek_table()

    # file-object protocol
    def write(self, data) -> int:
        return self.compress(data)

    def flush(self) -> None:
        if hasattr(self._writer, "flush"):
            self._writer.flush()
