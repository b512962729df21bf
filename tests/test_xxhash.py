"""XXH64 tests: known vectors + cross-check against libzstd's frame checksum.

The frame Content_Checksum is the low 32 bits of XXH64(content, 0)
(RFC 8878 §3.1.1), so compressing with libzstd with checksums on and reading
the trailing 4 bytes validates our implementation against the C one.
"""

import struct

import pytest

from zeekstd_tpu.xxhash64 import XXH64, content_checksum, xxh64

from .oracle import zstd_compress


def test_empty():
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999


def test_streaming_equals_oneshot():
    data = bytes(range(256)) * 41 + b"tail"
    h = XXH64(0)
    for i in range(0, len(data), 7):
        h.update(data[i : i + 7])
    assert h.digest() == xxh64(data, 0)


def test_seeded_consistency():
    data = b"hello world" * 100
    assert xxh64(data, 1) != xxh64(data, 0)
    h = XXH64(12345)
    h.update(data)
    assert h.digest() == xxh64(data, 12345)


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"abc",
        b"0123456789abcdef" * 2,  # exactly 32 bytes
        b"0123456789abcdef" * 2 + b"x",  # 33 bytes
        bytes(range(256)) * 100,
        b"\x00" * 31,
        b"\xff" * 1000,
    ],
)
def test_against_libzstd_frame_checksum(data):
    frame = zstd_compress(data, level=1, checksum=True)
    (expected,) = struct.unpack_from("<I", frame, len(frame) - 4)
    assert content_checksum(data) == expected


def test_reset_reuse():
    h = XXH64(0)
    h.update(b"first")
    h.reset()
    h.update(b"second")
    assert h.digest() == xxh64(b"second")
