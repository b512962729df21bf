"""Decoder oracle tests: libzstd compresses, our codec must reproduce the
exact input — the compat-oracle pattern the reference uses
(reference: lib/src/seek_table.rs:1156-1212 applies it to seek tables;
SURVEY §4.3). Covers all block types, literal modes, FSE modes, multi-block
frames, checksums, prefixes, and corrupt-input error behavior."""

import os
import random

import pytest

from zeekstd_tpu.codec.decompress import DCtx, decompress, decompress_frame
from zeekstd_tpu.errors import ZeekstdError, ZstdError

from .oracle import zstd_compress


def text_data(n):
    base = (
        b"It was the best of times, it was the worst of times, it was the age "
        b"of wisdom, it was the age of foolishness, it was the epoch of belief. "
    )
    return (base * (n // len(base) + 1))[:n]


def structured_data(n):
    rng = random.Random(42)
    parts = []
    words = [b"alpha", b"beta", b"gamma", b"delta", b"epsilon" * 3, b"zeta"]
    while sum(map(len, parts)) < n:
        parts.append(rng.choice(words))
        parts.append(bytes([rng.randrange(4)]))
    return b"".join(parts)[:n]


def random_data(n, seed=0):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(n))


CORPUS = [
    b"",
    b"a",
    b"abcabcabcabc",
    b"\x00" * 100,
    text_data(100),
    text_data(5000),
    text_data(200_000),  # multi-block
    structured_data(40_000),
    random_data(1000),  # raw blocks
    random_data(300_000),
    bytes(range(256)) * 600,
]


@pytest.mark.parametrize("level", [1, 3, 9, 19])
@pytest.mark.parametrize("idx", range(len(CORPUS)))
def test_oracle_roundtrip(level, idx):
    data = CORPUS[idx]
    frame = zstd_compress(data, level=level)
    out, end = decompress_frame(frame)
    assert end == len(frame)
    assert out == data


@pytest.mark.parametrize("level", [1, 3, 19])
def test_oracle_checksum(level):
    data = text_data(10_000)
    frame = zstd_compress(data, level=level, checksum=True)
    out, end = decompress_frame(frame)
    assert out == data
    assert end == len(frame)


def test_checksum_mismatch_detected():
    data = text_data(1000)
    frame = bytearray(zstd_compress(data, level=3, checksum=True))
    frame[-1] ^= 0xFF
    with pytest.raises(ZstdError) as ei:
        decompress_frame(bytes(frame))
    assert ei.value.name == "checksum_wrong"


def test_no_content_size_flag():
    data = text_data(3000)
    frame = zstd_compress(data, level=3, content_size_flag=False)
    out, _ = decompress_frame(frame)
    assert out == data


@pytest.mark.parametrize("level", [1, 3])
def test_prefix_decode(level):
    # Patch mode: matches reach back into the referenced prefix
    # (reference: lib/src/lib.rs:202-263 binary patch cycle).
    prefix = text_data(50_000)
    data = prefix[:30_000] + b"MIDDLE-EDIT" + prefix[30_000:45_000]
    frame = zstd_compress(data, level=level, prefix=prefix)
    dctx = DCtx()
    dctx.ref_prefix(prefix)
    out, _ = dctx.decompress_frame(frame)
    assert out == data


def test_prefix_applies_to_next_frame_only():
    prefix = text_data(10_000)
    data = prefix[:5000]
    frame = zstd_compress(data, level=1, prefix=prefix)
    dctx = DCtx()
    dctx.ref_prefix(prefix)
    out, _ = dctx.decompress_frame(frame)
    assert out == data
    # Second decode without prefix: a plain frame still works.
    plain = zstd_compress(b"hello world", level=1)
    out2, _ = dctx.decompress_frame(plain)
    assert out2 == b"hello world"


def test_skippable_frame_skipped():
    blob = b"\x5e\x2a\x4d\x18" + (4).to_bytes(4, "little") + b"PAYL"
    out, end = decompress_frame(blob)
    assert out == b""
    assert end == len(blob)


def test_multi_frame_concat():
    f1 = zstd_compress(b"first", level=1)
    f2 = zstd_compress(b"second", level=3)
    assert decompress(f1 + f2) == b"firstsecond"


def test_silesia_like_large():
    # ~1 MiB of mixed content through every level band.
    data = text_data(400_000) + structured_data(400_000) + random_data(200_000, 7)
    for level in (1, 9):
        frame = zstd_compress(data, level=level)
        out, _ = decompress_frame(frame)
        assert out == data


def test_window_log_max_enforced():
    data = text_data(200_000)
    frame = zstd_compress(data, level=19, window_log=24)
    with pytest.raises(ZstdError):
        decompress_frame(frame, window_log_max=10)
    out, _ = decompress_frame(frame, window_log_max=24)
    assert out == data


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_truncation_graceful(seed):
    # Truncated/corrupt inputs must raise ZeekstdError, never crash or hang
    # (BASELINE config 5: graceful error parity).
    rng = random.Random(seed)
    data = text_data(5000)
    frame = bytearray(zstd_compress(data, level=3, checksum=True))
    cut = rng.randrange(1, len(frame))
    try:
        decompress_frame(bytes(frame[:cut]))
    except ZeekstdError:
        pass  # expected


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_bitflip_graceful(seed):
    rng = random.Random(100 + seed)
    data = structured_data(8000)
    frame = bytearray(zstd_compress(data, level=9, checksum=True))
    for _ in range(3):
        frame[rng.randrange(len(frame))] ^= 1 << rng.randrange(8)
    try:
        out, _ = decompress_frame(bytes(frame))
    except ZeekstdError:
        pass  # detected corruption is the expected outcome
    except (IndexError, ValueError, OverflowError) as e:
        pytest.fail(f"non-taxonomy crash: {e!r}")
