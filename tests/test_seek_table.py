"""Seek-table format tests: golden bytes, round-trips, legacy v0.1.0 parse,
accessor math, resumable serialization, and error taxonomy parity
(reference tests: lib/src/seek_table.rs:1061-1278)."""

import io
import struct

import pytest

from zeekstd_tpu.constants import (
    SEEK_TABLE_INTEGRITY_SIZE,
    SEEKABLE_MAGIC_NUMBER,
    SKIPPABLE_HEADER_SIZE,
    SKIPPABLE_MAGIC_NUMBER,
)
from zeekstd_tpu.errors import FrameIndexTooLargeError, ZeekstdError, ZstdError
from zeekstd_tpu.seek_table import Format, Parser, SeekTable, Serializer
from zeekstd_tpu.seekable import BytesWrapper


def make_table(frames):
    return SeekTable.from_frames(frames)


def test_golden_foot_bytes():
    st = make_table([(10, 20), (30, 40)])
    blob = st.to_bytes(Format.FOOT)
    expected = (
        struct.pack("<II", SKIPPABLE_MAGIC_NUMBER, 8 * 2 + 9)
        + struct.pack("<IIII", 10, 20, 30, 40)
        + struct.pack("<IBI", 2, 0, SEEKABLE_MAGIC_NUMBER)
    )
    assert blob == expected


def test_golden_head_bytes():
    st = make_table([(10, 20), (30, 40)])
    blob = st.to_bytes(Format.HEAD)
    expected = (
        struct.pack("<II", SKIPPABLE_MAGIC_NUMBER, 8 * 2 + 9)
        + struct.pack("<IBI", 2, 0, SEEKABLE_MAGIC_NUMBER)
        + struct.pack("<IIII", 10, 20, 30, 40)
    )
    assert blob == expected


@pytest.mark.parametrize("fmt", [Format.FOOT, Format.HEAD])
def test_round_trip(fmt):
    frames = [(i * 7 + 1, i * 13 + 2) for i in range(100)]
    st = make_table(frames)
    blob = st.to_bytes(fmt)
    parsed = SeekTable.from_seekable_format(BytesWrapper(blob), fmt)
    assert parsed == st
    assert parsed.num_frames == 100


def test_foot_parse_with_preceding_data():
    # A Foot table appended after arbitrary archive bytes parses from the end.
    st = make_table([(5, 6), (7, 8), (9, 10)])
    blob = b"\xab" * 1234 + st.to_bytes(Format.FOOT)
    parsed = SeekTable.from_seekable(BytesWrapper(blob))
    assert parsed == st


def test_from_reader_head_forward_only():
    st = make_table([(100, 200), (300, 400)])
    blob = st.to_bytes(Format.HEAD)

    class ShortReader(io.RawIOBase):
        """Returns at most 3 bytes per read, mimicking BufReader short reads
        (a real corruption bug source; reference: lib/src/seek_table.rs:1227-1229)."""

        def __init__(self, data):
            self.data = data
            self.pos = 0

        def read(self, n=-1):
            chunk = self.data[self.pos : self.pos + min(n, 3)]
            self.pos += len(chunk)
            return chunk

    parsed = SeekTable.from_reader(ShortReader(blob))
    assert parsed == st


def test_legacy_v010_checksum_entries_parse():
    # v0.1.0 table: descriptor checksum bit set, 12-byte entries; checksums ignored
    # (reference: lib/src/seek_table.rs:1187-1212).
    entries = struct.pack("<III", 10, 20, 0xDEAD) + struct.pack("<III", 30, 40, 0xBEEF)
    frame_size = len(entries) + SEEK_TABLE_INTEGRITY_SIZE
    blob = (
        struct.pack("<II", SKIPPABLE_MAGIC_NUMBER, frame_size)
        + entries
        + struct.pack("<IBI", 2, 0x80, SEEKABLE_MAGIC_NUMBER)
    )
    parsed = SeekTable.from_seekable(BytesWrapper(blob))
    assert parsed == make_table([(10, 20), (30, 40)])


def test_accessor_math():
    # Accessor math over many frames (reference: lib/src/seek_table.rs:1084-1115).
    n = 1234
    st = make_table([(17, 100) for _ in range(n)])
    assert st.num_frames == n
    assert st.frame_start_comp(0) == 0
    assert st.frame_start_comp(10) == 170
    assert st.frame_end_comp(10) == 187
    assert st.frame_size_comp(10) == 17
    assert st.frame_start_decomp(10) == 1000
    assert st.frame_end_decomp(10) == 1100
    assert st.frame_size_decomp(10) == 100
    assert st.size_comp == 17 * n
    assert st.size_decomp == 100 * n
    assert st.max_frame_size_comp == 17
    assert st.max_frame_size_decomp == 100


def test_frame_index_binary_search():
    st = make_table([(10, 100), (10, 50), (10, 200)])
    assert st.frame_index_decomp(0) == 0
    assert st.frame_index_decomp(99) == 0
    assert st.frame_index_decomp(100) == 1
    assert st.frame_index_decomp(149) == 1
    assert st.frame_index_decomp(150) == 2
    assert st.frame_index_decomp(349) == 2
    # Past-the-end clamps to last frame (reference: lib/src/seek_table.rs:916-934).
    assert st.frame_index_decomp(10_000) == 2
    assert st.frame_index_comp(29) == 2
    assert st.frame_index_comp(9) == 0


def test_frame_index_out_of_range_accessors():
    st = make_table([(1, 1)])
    with pytest.raises(FrameIndexTooLargeError):
        st.frame_start_comp(1)
    with pytest.raises(FrameIndexTooLargeError):
        st.frame_size_decomp(5)


def test_serializer_tiny_buffers():
    # Serializer must split writes across arbitrarily small buffers
    # (reference: lib/src/seek_table.rs:1255-1260 proptest with bufs 1..64).
    st = make_table([(i + 1, 2 * i + 1) for i in range(50)])
    for bufsize in (1, 2, 3, 5, 7, 13, 64):
        ser = st.into_format_serializer(Format.FOOT)
        out = bytearray()
        buf = bytearray(bufsize)
        while True:
            n = ser.write_into(buf)
            if n == 0:
                break
            out += buf[:n]
        assert bytes(out) == st.to_bytes(Format.FOOT)
        assert len(out) == ser.encoded_len


def test_serializer_read_api():
    st = make_table([(3, 4)])
    ser = st.into_serializer()
    blob = b""
    while True:
        chunk = ser.read(5)
        if not chunk:
            break
        blob += chunk
    assert blob == st.to_bytes(Format.FOOT)
    ser.reset()
    assert ser.read(-1) == blob


def test_error_wrong_seekable_magic():
    st = make_table([(1, 1)])
    blob = bytearray(st.to_bytes(Format.FOOT))
    blob[-1] ^= 0xFF
    with pytest.raises(ZstdError) as ei:
        SeekTable.from_seekable(BytesWrapper(bytes(blob)))
    assert ei.value.name == "prefix_unknown"


def test_error_reserved_descriptor_bits():
    st = make_table([(1, 1)])
    blob = bytearray(st.to_bytes(Format.FOOT))
    blob[-5] = 0x04  # a reserved bit
    with pytest.raises(ZstdError) as ei:
        SeekTable.from_seekable(BytesWrapper(bytes(blob)))
    assert ei.value.name == "corruption_detected"


def test_error_skippable_size_mismatch():
    st = make_table([(1, 1), (2, 2)])
    blob = bytearray(st.to_bytes(Format.FOOT))
    struct.pack_into("<I", blob, 4, 999)  # corrupt Frame_Size
    with pytest.raises(ZstdError) as ei:
        SeekTable.from_seekable(BytesWrapper(bytes(blob)))
    assert ei.value.name == "corruption_detected"


def test_error_truncated_entries():
    st = make_table([(1, 1), (2, 2), (3, 3)])
    blob = st.to_bytes(Format.HEAD)
    truncated = blob[: SKIPPABLE_HEADER_SIZE + SEEK_TABLE_INTEGRITY_SIZE + 4]
    with pytest.raises(ZeekstdError):
        SeekTable.from_seekable_format(BytesWrapper(truncated), Format.HEAD)


def test_log_frame_u32_overflow():
    st = SeekTable()
    with pytest.raises(ZeekstdError):
        st.log_frame(1 << 32, 1)


def test_empty_table_round_trip():
    st = SeekTable()
    blob = st.to_bytes(Format.FOOT)
    parsed = SeekTable.from_seekable(BytesWrapper(blob))
    assert parsed.num_frames == 0
    assert parsed.size_comp == 0


def test_parser_incremental_chunks():
    st = make_table([(i, i) for i in range(1, 20)])
    blob = st.to_bytes(Format.FOOT)
    entries = blob[SKIPPABLE_HEADER_SIZE : -SEEK_TABLE_INTEGRITY_SIZE]
    parser = Parser.from_bytes(blob[-SEEK_TABLE_INTEGRITY_SIZE:])
    parser.verify_skippable_header(blob[:SKIPPABLE_HEADER_SIZE])
    pos = 0
    pending = b""
    # Feed 5 bytes at a time; parser must only consume whole entries.
    while pos < len(entries) or pending:
        pending += entries[pos : pos + 5]
        pos = min(pos + 5, len(entries))
        consumed = parser.parse_entries(pending)
        assert consumed % 8 == 0
        pending = pending[consumed:]
        if pos == len(entries) and consumed == 0:
            break
    parser.verify()
    assert parser.into_seek_table() == st
