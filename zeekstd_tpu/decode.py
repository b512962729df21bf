"""Streaming seekable decoder: random access by offset or frame index.

Mirrors the reference's decode layer (reference: lib/src/decode.rs):
``DecodeOptions`` builder (decode.rs:12-114) and ``Decoder``
(decode.rs:116-466) with ``set_offset`` / ``set_offset_limit`` /
``set_lower_frame`` / ``set_upper_frame`` random access, ``reset``, and the
file-object ``read``/``seek`` protocol (the reference's io::Read/io::Seek
impls, decode.rs:508-579).

Design difference: the reference dummy-decodes block-by-block up to a
mid-frame offset (decode.rs:228-232); here the resumable unit is the frame —
a frame is decoded as a whole (frames are policy-bounded, 2 MiB default)
and served from a buffer, which is also the unit the TPU parallel path
decodes per chip. ``set_offset`` keeps the current frame buffer when the
target lies within it (the continue-vs-reset rule, decode.rs:402-414).
"""

from __future__ import annotations

import io
import os

from .codec.decompress import DCtx
from .errors import OffsetOutOfRangeError, ZeekstdError
from .seek_table import SeekTable
from .seekable import Seekable, Start, as_seekable


class DecodeOptions:
    """Builder (reference: lib/src/decode.rs:12-114). Frame indices override
    byte offsets (decode.rs:70-84, 157-172)."""

    def __init__(self, src, dctx: DCtx | None = None):
        self.src = src
        self.dctx = dctx if dctx is not None else DCtx()
        self.seek_table: SeekTable | None = None
        self._lower_frame: int | None = None
        self._upper_frame: int | None = None
        self._offset: int | None = None
        self._offset_limit: int | None = None
        self._prefix: bytes | None = None
        self.backend = "auto"

    def with_backend(self, backend: str) -> "DecodeOptions":
        if backend not in ("auto", "python", "native"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        return self

    def with_dctx(self, dctx: DCtx) -> "DecodeOptions":
        self.dctx = dctx
        return self

    def with_seek_table(self, st: SeekTable) -> "DecodeOptions":
        """Skip parsing the table from the source (reference: decode.rs:61-68)."""
        self.seek_table = st
        return self

    def with_lower_frame(self, index: int) -> "DecodeOptions":
        self._lower_frame = index
        return self

    def with_upper_frame(self, index: int) -> "DecodeOptions":
        self._upper_frame = index
        return self

    def with_offset(self, offset: int) -> "DecodeOptions":
        self._offset = offset
        return self

    def with_offset_limit(self, limit: int) -> "DecodeOptions":
        self._offset_limit = limit
        return self

    def with_prefix(self, prefix: bytes) -> "DecodeOptions":
        self._prefix = prefix
        return self

    def into_decoder(self) -> "Decoder":
        return Decoder(self)


class Decoder:
    """Seekable decoder over any byte source (reference: lib/src/decode.rs:116-466)."""

    def __init__(self, options: DecodeOptions):
        self.dctx = options.dctx
        self.src: Seekable = as_seekable(options.src)
        if options.seek_table is not None:
            self._st = options.seek_table
        else:
            self._st = SeekTable.from_seekable(self.src)
        self._prefix = options._prefix

        offset = options._offset
        limit = options._offset_limit
        if options._lower_frame is not None:
            offset = self._st.frame_start_decomp(options._lower_frame)
        if options._upper_frame is not None:
            limit = self._st.frame_end_decomp(options._upper_frame)
        if offset is None:
            offset = 0
        if limit is None:
            limit = self._st.size_decomp
        self._validate_offset(offset)
        self._validate_offset(limit)

        self._initial_offset = offset
        self._initial_limit = limit
        self.offset = offset
        self.offset_limit = limit
        self._read_compressed = 0
        self._backend = options.backend
        if self._backend == "auto":
            from .native import loader

            self._backend = "native" if loader.available() else "python"
        # In-memory decoded frame cache: (frame_index, bytes) or None.
        self._cur_frame: int | None = None
        self._cur_data: bytes | None = None

    # -- helpers -----------------------------------------------------------

    def _validate_offset(self, offset: int) -> None:
        """(reference: lib/src/decode.rs:439-445)"""
        if offset < 0 or offset > self._st.size_decomp:
            raise OffsetOutOfRangeError(
                f"offset {offset} out of range (0..{self._st.size_decomp})"
            )

    def _load_frame(self, index: int) -> None:
        """Read + decode one frame from the source into the cache."""
        start = self._st.frame_start_comp(index)
        size = self._st.frame_size_comp(index)
        self.src.set_offset(Start(start))
        buf = b""
        while len(buf) < size:
            chunk = self.src.read(size - len(buf))
            if not chunk:
                raise ZeekstdError(f"unexpected EOF reading frame {index}")
            buf += chunk
        self._read_compressed += len(buf)
        expected_size = self._st.frame_size_decomp(index)
        if self._backend == "native":
            from .native.frame import native_decompress_frame

            out, _ = native_decompress_frame(
                buf, expected_size + 64, prefix=self._prefix or b""
            )
        else:
            if self._prefix is not None:
                self.dctx.ref_prefix(self._prefix)
            out, _ = self.dctx.decompress_frame(buf)
        expected = self._st.frame_size_decomp(index)
        if len(out) != expected:
            raise ZeekstdError(
                f"frame {index} decoded to {len(out)} bytes, seek table says {expected}"
            )
        self._cur_frame = index
        self._cur_data = out

    # -- core decode -------------------------------------------------------

    def decompress(self, size: int = -1) -> bytes:
        """Decode up to ``size`` bytes from the current offset, bounded by
        the offset limit (reference loop: lib/src/decode.rs:201-270)."""
        if size is None or size < 0:
            size = self.offset_limit - self.offset
        out = []
        remaining = min(size, self.offset_limit - self.offset)
        while remaining > 0:
            if self._st.num_frames == 0:
                break
            index = self._st.frame_index_decomp(self.offset)
            f_start = self._st.frame_start_decomp(index)
            f_end = self._st.frame_end_decomp(index)
            if self.offset >= f_end:
                break  # at archive end
            if self._cur_frame != index:
                self._load_frame(index)
            lo = self.offset - f_start
            take = min(remaining, f_end - self.offset)
            out.append(self._cur_data[lo : lo + take])
            self.offset += take
            remaining -= take
        return b"".join(out)

    def decompress_into(self, buf) -> int:
        """Fill a caller buffer; returns bytes written (0 at end)."""
        view = memoryview(buf)
        chunk = self.decompress(len(view))
        view[: len(chunk)] = chunk
        return len(chunk)

    # -- random access (reference: lib/src/decode.rs:346-437) --------------

    def set_offset(self, offset: int) -> None:
        """Continue within the current frame when possible, else retarget
        (reference continue-vs-reset rule: lib/src/decode.rs:402-414)."""
        self._validate_offset(offset)
        if self._cur_frame is not None:
            f_start = self._st.frame_start_decomp(self._cur_frame)
            f_end = self._st.frame_end_decomp(self._cur_frame)
            if not (f_start <= offset < f_end):
                self._cur_frame = None
                self._cur_data = None
        self.offset = offset

    def set_offset_limit(self, limit: int) -> None:
        """Changeable mid-stream; may stop before frame end
        (reference: lib/src/decode.rs:432-437)."""
        self._validate_offset(limit)
        self.offset_limit = limit

    def set_prefix(self, prefix) -> None:
        """Change the referenced prefix for subsequently decoded frames
        (the per-call prefix of the reference's decompress_with_prefix,
        lib/src/decode.rs:201-270); drops the cached frame."""
        self._prefix = bytes(prefix) if prefix is not None else None
        self._cur_frame = None
        self._cur_data = None

    def set_lower_frame(self, index: int) -> None:
        self.set_offset(self._st.frame_start_decomp(index))

    def set_upper_frame(self, index: int) -> None:
        self.set_offset_limit(self._st.frame_end_decomp(index))

    def reset(self) -> None:
        """Back to the initially-configured window (reference: decode.rs:346-350)."""
        self.offset = self._initial_offset
        self.offset_limit = self._initial_limit
        self._cur_frame = None
        self._cur_data = None
        self.dctx.reset_session()

    # -- accessors ---------------------------------------------------------

    def seek_table(self) -> SeekTable:
        return self._st

    @property
    def read_compressed(self) -> int:
        """Total compressed bytes read from the source
        (reference: lib/src/decode.rs:447-450)."""
        return self._read_compressed

    # -- file-object protocol ---------------------------------------------

    def read(self, size: int = -1) -> bytes:
        return self.decompress(size)

    def readinto(self, buf) -> int:
        return self.decompress_into(buf)

    def seek(self, offset: int, whence: int = os.SEEK_SET) -> int:
        """io.Seek semantics over the decompressed stream
        (reference: lib/src/decode.rs:545-579)."""
        if whence == os.SEEK_SET:
            target = offset
        elif whence == os.SEEK_CUR:
            target = self.offset + offset
        elif whence == os.SEEK_END:
            target = self._st.size_decomp + offset
        else:
            raise ValueError(f"bad whence {whence}")
        if target < 0:
            raise OffsetOutOfRangeError("seek before start of stream")
        self.set_offset(target)
        return target

    def tell(self) -> int:
        return self.offset

    def seekable(self) -> bool:
        return True
