"""Seek table: in-memory frame index, binary parser, and resumable serializer.

Implements the Zstandard Seekable Format v0.1.1 seek table (spec:
reference seekable_format.md) in both ``Foot`` and ``Head`` layouts, plus
parsing of legacy v0.1.0 tables whose entries carry 12-byte checksummed
entries (checksums are parsed and ignored).

Design follows the reference (lib/src/seek_table.rs): entries are stored as
*cumulative* compressed/decompressed offsets with a leading ``(0, 0)``
sentinel, so ``num_frames = len(entries) - 1`` and every accessor is O(1)
while ``frame_index_*`` is a binary search over the cumulative arrays
(reference: lib/src/seek_table.rs:287-294, 916-934). Offsets live in numpy
``uint64`` arrays so lookups vectorize and the table can be shipped to TPU
for query routing in the parallel layer.
"""

from __future__ import annotations

import enum
import struct

import numpy as np

from .constants import (
    SEEK_TABLE_INTEGRITY_SIZE,
    SEEKABLE_MAGIC_NUMBER,
    SEEKABLE_MAX_FRAMES,
    SIZE_PER_FRAME,
    SIZE_PER_FRAME_WITH_CHECKSUM,
    SKIPPABLE_HEADER_SIZE,
    SKIPPABLE_MAGIC_NUMBER,
)
from .errors import (
    FrameIndexTooLargeError,
    NumberConversionError,
    corruption_detected,
    prefix_unknown,
)
from .seekable import End, Seekable, Start, as_seekable


class Format(enum.Enum):
    """Seek-table layout (reference: lib/src/seek_table.rs:227-241).

    ``FOOT``: integrity field last (v0.1.0-compatible, appended tables).
    ``HEAD``: integrity field directly after the skippable header
    (standalone files, readable without seeking to the end).
    """

    FOOT = "foot"
    HEAD = "head"


_U32_MAX = 0xFFFF_FFFF


def _check_u32(value: int, what: str) -> int:
    if not 0 <= value <= _U32_MAX:
        raise NumberConversionError(f"{what} {value} does not fit in u32")
    return value


class SeekTable:
    """Mutable in-memory seek table with cumulative-offset entries."""

    def __init__(self):
        # Cumulative offsets with leading (0, 0) sentinel; grown amortized.
        self._cap = 16
        self._c = np.zeros(self._cap, dtype=np.uint64)
        self._d = np.zeros(self._cap, dtype=np.uint64)
        self._len = 1  # sentinel

    # --- construction -----------------------------------------------------

    @classmethod
    def from_frames(cls, frames) -> "SeekTable":
        """Build from an iterable of (compressed_size, decompressed_size)."""
        st = cls()
        for c, d in frames:
            st.log_frame(c, d)
        return st

    @classmethod
    def from_seekable(cls, src) -> "SeekTable":
        """Parse from a seekable source with an appended (Foot) table
        (reference: lib/src/seek_table.rs:338-436)."""
        return cls.from_seekable_format(src, Format.FOOT)

    @classmethod
    def from_seekable_format(cls, src, fmt: Format) -> "SeekTable":
        src = as_seekable(src)
        integrity = src.seek_table_integrity(fmt)
        parser = Parser.from_bytes(integrity)

        table_size = parser.seek_table_size
        if fmt == Format.FOOT:
            src.set_offset(End(-table_size))
        else:
            src.set_offset(Start(0))

        # Read and verify the 8-byte skippable header.
        header = _read_exact(src, SKIPPABLE_HEADER_SIZE)
        parser.verify_skippable_header(header)

        if fmt == Format.HEAD:
            # Integrity field sits right after the header; skip it.
            _read_exact(src, SEEK_TABLE_INTEGRITY_SIZE)
            remaining = parser.entries_size
        else:
            remaining = parser.entries_size

        _parse_entry_stream(parser, src, remaining)
        parser.verify()
        return parser.into_seek_table()

    @classmethod
    def from_reader(cls, reader) -> "SeekTable":
        """Forward-only parse of a standalone Head-format table from any
        readable stream (reference: lib/src/seek_table.rs:461-493)."""

        def read_exact(n: int) -> bytes:
            buf = b""
            while len(buf) < n:
                chunk = reader.read(n - len(buf))
                if not chunk:
                    raise corruption_detected("unexpected EOF in seek table")
                buf += chunk
            return buf

        header = read_exact(SKIPPABLE_HEADER_SIZE)
        magic, frame_size = struct.unpack("<II", header)
        if magic != SKIPPABLE_MAGIC_NUMBER:
            raise prefix_unknown("missing skippable frame magic")
        integrity = read_exact(SEEK_TABLE_INTEGRITY_SIZE)
        parser = Parser.from_bytes(integrity)
        parser.verify_skippable_header(header)

        class _FwdSrc:
            def read(self, n):
                return reader.read(n)

        _parse_entry_stream(parser, _FwdSrc(), parser.entries_size)
        parser.verify()
        return parser.into_seek_table()

    @classmethod
    def from_bytes(cls, data: bytes, fmt: Format = Format.FOOT) -> "SeekTable":
        return cls.from_seekable_format(data, fmt)

    # --- mutation ---------------------------------------------------------

    def log_frame(self, c_size: int, d_size: int) -> None:
        """Append a frame of the given compressed/decompressed sizes
        (reference: lib/src/seek_table.rs:513-525)."""
        if self.num_frames >= SEEKABLE_MAX_FRAMES:
            raise FrameIndexTooLargeError(
                f"seek table full ({SEEKABLE_MAX_FRAMES} frames)"
            )
        _check_u32(c_size, "compressed frame size")
        _check_u32(d_size, "decompressed frame size")
        if self._len == self._cap:
            self._cap *= 2
            self._c = np.resize(self._c, self._cap)
            self._d = np.resize(self._d, self._cap)
        self._c[self._len] = self._c[self._len - 1] + np.uint64(c_size)
        self._d[self._len] = self._d[self._len - 1] + np.uint64(d_size)
        self._len += 1

    def reset(self) -> None:
        self._len = 1

    # --- accessors (reference: lib/src/seek_table.rs:604-859) -------------

    @property
    def num_frames(self) -> int:
        return self._len - 1

    def _check_index(self, index: int) -> None:
        if index >= self.num_frames or index < 0:
            raise FrameIndexTooLargeError(
                f"frame index {index} out of range ({self.num_frames} frames)"
            )

    def frame_start_comp(self, index: int) -> int:
        self._check_index(index)
        return int(self._c[index])

    def frame_start_decomp(self, index: int) -> int:
        self._check_index(index)
        return int(self._d[index])

    def frame_end_comp(self, index: int) -> int:
        self._check_index(index)
        return int(self._c[index + 1])

    def frame_end_decomp(self, index: int) -> int:
        self._check_index(index)
        return int(self._d[index + 1])

    def frame_size_comp(self, index: int) -> int:
        self._check_index(index)
        return int(self._c[index + 1] - self._c[index])

    def frame_size_decomp(self, index: int) -> int:
        self._check_index(index)
        return int(self._d[index + 1] - self._d[index])

    @property
    def size_comp(self) -> int:
        return int(self._c[self._len - 1])

    @property
    def size_decomp(self) -> int:
        return int(self._d[self._len - 1])

    @property
    def max_frame_size_comp(self) -> int:
        if self.num_frames == 0:
            return 0
        return int(np.max(np.diff(self._c[: self._len])))

    @property
    def max_frame_size_decomp(self) -> int:
        if self.num_frames == 0:
            return 0
        return int(np.max(np.diff(self._d[: self._len])))

    def frame_index_comp(self, offset: int) -> int:
        """Index of the frame containing compressed offset ``offset``;
        offsets at or past the end clamp to the last frame
        (reference: lib/src/seek_table.rs:916-934)."""
        return self._frame_index(self._c, offset)

    def frame_index_decomp(self, offset: int) -> int:
        return self._frame_index(self._d, offset)

    def _frame_index(self, arr: np.ndarray, offset: int) -> int:
        if self.num_frames == 0:
            return 0
        idx = int(np.searchsorted(arr[: self._len], np.uint64(offset), side="right")) - 1
        return min(max(idx, 0), self.num_frames - 1)

    # --- bulk views (used by the parallel layer) --------------------------

    def cumulative_offsets(self):
        """(c_offsets, d_offsets) cumulative arrays including the sentinel."""
        return self._c[: self._len].copy(), self._d[: self._len].copy()

    def frame_sizes(self):
        """(c_sizes, d_sizes) per-frame size arrays."""
        return (
            np.diff(self._c[: self._len]).astype(np.uint32),
            np.diff(self._d[: self._len]).astype(np.uint32),
        )

    # --- serialization ----------------------------------------------------

    def into_serializer(self) -> "Serializer":
        return Serializer(self, Format.FOOT)

    def into_format_serializer(self, fmt: Format) -> "Serializer":
        return Serializer(self, fmt)

    def to_bytes(self, fmt: Format = Format.FOOT) -> bytes:
        return self.into_format_serializer(fmt).to_bytes()

    def __eq__(self, other) -> bool:
        if not isinstance(other, SeekTable):
            return NotImplemented
        return (
            self._len == other._len
            and bool(np.array_equal(self._c[: self._len], other._c[: other._len]))
            and bool(np.array_equal(self._d[: self._len], other._d[: other._len]))
        )

    def __repr__(self) -> str:
        return (
            f"SeekTable(num_frames={self.num_frames}, size_comp={self.size_comp}, "
            f"size_decomp={self.size_decomp})"
        )


def _read_exact(src: Seekable, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = src.read(n - len(buf))
        if not chunk:
            raise corruption_detected("unexpected EOF in seek table")
        buf += chunk
    return buf


def _parse_entry_stream(parser: "Parser", src, remaining: int, chunk_size: int = 8192):
    """Drive Parser.parse_entries over chunked reads, compacting partial
    entries between reads (reference: lib/src/seek_table.rs:388-432)."""
    buf = b""
    while remaining > 0 or buf:
        want = min(chunk_size - len(buf), remaining)
        if want > 0:
            chunk = src.read(want)
            if not chunk:
                raise corruption_detected("unexpected EOF in seek table entries")
            remaining -= len(chunk)
            buf += chunk
        consumed = parser.parse_entries(buf)
        buf = buf[consumed:]
        if consumed == 0 and remaining == 0:
            if buf:
                raise corruption_detected("trailing partial seek table entry")
            break


class Parser:
    """Incremental seek-table parser (reference: lib/src/seek_table.rs:133-225).

    ``from_bytes`` validates the 9-byte integrity field; ``parse_entries``
    consumes whole 8- or 12-byte entries per call and returns the number of
    bytes consumed, allowing arbitrary chunking of the input.
    """

    def __init__(self, num_frames: int, with_checksum: bool):
        self.num_frames = num_frames
        self.with_checksum = with_checksum
        self.size_per_frame = (
            SIZE_PER_FRAME_WITH_CHECKSUM if with_checksum else SIZE_PER_FRAME
        )
        self._table = SeekTable()
        self._parsed = 0

    @classmethod
    def from_bytes(cls, integrity: bytes) -> "Parser":
        if len(integrity) != SEEK_TABLE_INTEGRITY_SIZE:
            raise corruption_detected(
                f"integrity field must be {SEEK_TABLE_INTEGRITY_SIZE} bytes"
            )
        num_frames, descriptor, magic = struct.unpack("<IBI", integrity)
        if magic != SEEKABLE_MAGIC_NUMBER:
            raise prefix_unknown("missing seekable magic number")
        if descriptor & 0x7C:
            # Reserved bits 6-2 must be zero (spec: seekable_format.md
            # Seek_Table_Descriptor; reference: lib/src/seek_table.rs:150-152).
            raise corruption_detected("reserved seek table descriptor bits set")
        if num_frames > SEEKABLE_MAX_FRAMES:
            raise FrameIndexTooLargeError(
                f"seek table claims {num_frames} frames (max {SEEKABLE_MAX_FRAMES})"
            )
        with_checksum = bool(descriptor & 0x80)
        return cls(num_frames, with_checksum)

    @property
    def entries_size(self) -> int:
        return self.size_per_frame * self.num_frames

    @property
    def frame_size_field(self) -> int:
        """Value of the skippable frame's Frame_Size field."""
        return self.entries_size + SEEK_TABLE_INTEGRITY_SIZE

    @property
    def seek_table_size(self) -> int:
        """Total on-disk size of the seek-table skippable frame."""
        return SKIPPABLE_HEADER_SIZE + self.frame_size_field

    def verify_skippable_header(self, header: bytes) -> None:
        """Check magic and the exact Frame_Size
        (reference: lib/src/seek_table.rs:174-184)."""
        magic, frame_size = struct.unpack("<II", header[:SKIPPABLE_HEADER_SIZE])
        if magic != SKIPPABLE_MAGIC_NUMBER:
            raise prefix_unknown("missing skippable frame magic")
        if frame_size != self.frame_size_field:
            raise corruption_detected(
                f"skippable frame size {frame_size} != expected {self.frame_size_field}"
            )

    def parse_entries(self, buf: bytes) -> int:
        """Consume as many whole entries as available; returns bytes consumed
        (reference: lib/src/seek_table.rs:189-209)."""
        spf = self.size_per_frame
        n_avail = len(buf) // spf
        n_take = min(n_avail, self.num_frames - self._parsed)
        if n_take <= 0:
            return 0
        raw = np.frombuffer(buf[: n_take * spf], dtype=np.uint32)
        if self.with_checksum:
            raw = raw.reshape(n_take, 3)
        else:
            raw = raw.reshape(n_take, 2)
        for c, d in raw[:, :2]:
            self._table.log_frame(int(c), int(d))
        self._parsed += n_take
        return n_take * spf

    def verify(self) -> None:
        """All entries present? (reference: lib/src/seek_table.rs:218-224)."""
        if self._parsed != self.num_frames:
            raise corruption_detected(
                f"seek table has {self._parsed} entries, expected {self.num_frames}"
            )

    def into_seek_table(self) -> SeekTable:
        return self._table


class Serializer:
    """Resumable seek-table serializer (reference: lib/src/seek_table.rs:955-1058).

    Writes into arbitrarily small caller buffers: a global write position is
    tracked so even a u32 can be split across calls. Layout —
    Foot: skippable header, entries, integrity;
    Head: skippable header, integrity, entries.
    """

    def __init__(self, seek_table: SeekTable, fmt: Format = Format.FOOT):
        self._st = seek_table
        self._fmt = fmt
        self._pos = 0
        self._blob = None

    @property
    def encoded_len(self) -> int:
        """Total serialized length: 8 + 9 + 8 * num_frames
        (reference: lib/src/seek_table.rs:1042-1044)."""
        return (
            SKIPPABLE_HEADER_SIZE
            + SEEK_TABLE_INTEGRITY_SIZE
            + SIZE_PER_FRAME * self._st.num_frames
        )

    def _render(self) -> bytes:
        st = self._st
        n = st.num_frames
        c_sizes, d_sizes = st.frame_sizes()
        entries = np.empty((n, 2), dtype=np.uint32)
        entries[:, 0] = c_sizes
        entries[:, 1] = d_sizes
        header = struct.pack(
            "<II",
            SKIPPABLE_MAGIC_NUMBER,
            SIZE_PER_FRAME * n + SEEK_TABLE_INTEGRITY_SIZE,
        )
        # Descriptor byte is always 0 in v0.1.1 (no seek-table checksums;
        # reference: lib/src/seek_table.rs:70-74).
        integrity = struct.pack("<IBI", n, 0, SEEKABLE_MAGIC_NUMBER)
        if self._fmt == Format.HEAD:
            return header + integrity + entries.tobytes()
        return header + entries.tobytes() + integrity

    def write_into(self, buf) -> int:
        """Fill ``buf`` (a writable buffer) with the next serialized bytes;
        returns the byte count, 0 when done."""
        if self._blob is None:
            self._blob = self._render()
        view = memoryview(buf)
        chunk = self._blob[self._pos : self._pos + len(view)]
        view[: len(chunk)] = chunk
        self._pos += len(chunk)
        return len(chunk)

    def read(self, n: int = -1) -> bytes:
        """io.RawIOBase-style read of the serialized table
        (reference impls io::Read at lib/src/seek_table.rs:1053-1059)."""
        if self._blob is None:
            self._blob = self._render()
        if n is None or n < 0:
            n = len(self._blob) - self._pos
        chunk = self._blob[self._pos : self._pos + n]
        self._pos += len(chunk)
        return chunk

    def to_bytes(self) -> bytes:
        if self._blob is None:
            self._blob = self._render()
        return self._blob

    def reset(self) -> None:
        self._pos = 0

    def seek_table(self) -> SeekTable:
        return self._st
