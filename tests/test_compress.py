"""Encoder oracle tests: our frames must decode bit-exactly in BOTH our
decoder and libzstd (independent-implementation compat, the reference's
oracle pattern), and compressed size must not exceed libzstd's at the
benchmark levels (BASELINE.md target)."""

import random

import pytest

from zeekstd_tpu.codec import CCtx, compress_frame, decompress_frame
from zeekstd_tpu.codec.decompress import DCtx

from .oracle import zstd_compress, zstd_decompress
from .test_decompress import CORPUS, random_data, structured_data, text_data


@pytest.mark.parametrize("level", [1, 3, 9, 19])
@pytest.mark.parametrize("idx", range(len(CORPUS)))
def test_roundtrip_both_decoders(level, idx):
    data = CORPUS[idx]
    if len(data) > 250_000 and level > 3:
        pytest.skip("slow level on large input covered by smaller cases")
    frame = compress_frame(data, level=level)
    out, end = decompress_frame(frame)
    assert out == data
    assert end == len(frame)
    assert zstd_decompress(frame, max_size=len(data) + 64) == data


@pytest.mark.parametrize("level", [1, 3])
def test_checksum_emitted_and_verified(level):
    data = text_data(50_000)
    frame = compress_frame(data, level=level, checksum=True)
    # Frame header descriptor bit 0x4 set (reference test: encode.rs:833-870).
    assert frame[4] & 0x04
    out, _ = decompress_frame(frame)
    assert out == data
    assert zstd_decompress(frame) == data
    nochk = compress_frame(data, level=level, checksum=False)
    assert not nochk[4] & 0x04


@pytest.mark.parametrize("level", [1, 3])
def test_size_not_worse_than_libzstd(level):
    # BASELINE.md: compressed size <= reference at equal level (text inputs).
    for data in (text_data(150_000), structured_data(100_000)):
        ours = len(compress_frame(data, level=level))
        ref = len(zstd_compress(data, level=level))
        assert ours <= ref * 1.01, f"L{level}: ours {ours} vs libzstd {ref}"


def test_incompressible_falls_back_to_raw_blocks():
    data = random_data(100_000, seed=3)
    frame = compress_frame(data, level=3)
    assert len(frame) <= len(data) + 128  # raw blocks + headers only
    assert zstd_decompress(frame) == data


def test_multi_block_frame():
    data = text_data(300_000)  # > 2 blocks
    frame = compress_frame(data, level=1)
    out, _ = decompress_frame(frame)
    assert out == data
    assert zstd_decompress(frame) == data


@pytest.mark.parametrize("level", [1, 3])
def test_prefix_patch_cycle(level):
    # Binary patch: compress new version against old as prefix; both our
    # decoder and libzstd must reconstruct with the same prefix
    # (reference: lib/src/lib.rs:202-263).
    # Random base: incompressible on its own, so the prefix is the only
    # source of matches and the patch must collapse to near-nothing.
    old = random_data(60_000, seed=11)
    new = old[:20_000] + b"<<<patched segment>>>" + old[20_000:50_000] + b"tail"
    cctx = CCtx()
    cctx.set_compression_level(level)
    cctx.ref_prefix(old)
    frame = cctx.compress_frame(new)
    # Patch should be far smaller than compressing fresh.
    fresh = compress_frame(new, level=level)
    assert len(frame) < len(fresh) // 2

    dctx = DCtx()
    dctx.ref_prefix(old)
    out, _ = dctx.decompress_frame(frame)
    assert out == new
    assert zstd_decompress(frame, prefix=old) == new


def test_cctx_prefix_cleared_after_frame():
    cctx = CCtx()
    cctx.ref_prefix(b"some prefix data here")
    _ = cctx.compress_frame(b"hello")
    frame2 = cctx.compress_frame(b"hello")
    assert zstd_decompress(frame2) == b"hello"  # no prefix needed


def test_empty_and_tiny():
    for data in (b"", b"x", b"ab"):
        frame = compress_frame(data, level=3, checksum=True)
        out, end = decompress_frame(frame)
        assert out == data and end == len(frame)
        assert zstd_decompress(frame) == data


def test_rle_heavy():
    data = b"\x00" * 70_000 + b"a" * 1000 + b"\xff" * 70_000
    frame = compress_frame(data, level=1)
    assert len(frame) < 200
    assert zstd_decompress(frame) == data
    out, _ = decompress_frame(frame)
    assert out == data


@pytest.mark.parametrize("seed", range(8))
def test_random_structured_fuzz(seed):
    rng = random.Random(seed)
    n = rng.randrange(1, 30_000)
    kind = rng.randrange(3)
    if kind == 0:
        data = structured_data(n)
    elif kind == 1:
        data = random_data(n, seed)
    else:
        data = text_data(n)
    level = rng.choice([1, 3, 9])
    frame = compress_frame(data, level=level, checksum=bool(seed % 2))
    out, _ = decompress_frame(frame)
    assert out == data
    assert zstd_decompress(frame) == data


def test_window_log_override():
    data = text_data(100_000)
    frame = compress_frame(data, level=1, window_log=12)
    out, _ = decompress_frame(frame, window_log_max=12)
    assert out == data
    assert zstd_decompress(frame) == data


def test_ldm_patch_mode_shrinks_output():
    """LDM reaches across a prefix far larger than what the ordinary
    hash tables retain (reference behavior: EnableLongDistanceMatching in
    patch mode, cli/src/compress.rs:31-37). The workload floods the short
    hash buckets with near-range template repeats so only the 32-byte
    long-distance table can re-lock onto the aligned prefix positions."""
    import random

    from zeekstd_tpu.codec.compress import compress_frame
    from zeekstd_tpu.codec.decompress import decompress_frame

    rng = random.Random(99)
    words = ["GET", "POST", "/api/v1/items", "200", "404", "t=12ms"]
    lines = [
        f"10:{i%60:02d}:{i%60:02d} host-{i%8} {rng.choice(words)} {rng.choice(words)}\n"
        for i in range(12000)
    ]
    prefix = "".join(lines).encode()[: 300 << 10]
    data = bytearray(prefix)
    for i in range(0, len(data), 4096):
        data[i] = rng.randrange(256)
    data = bytes(data)

    plain = compress_frame(data, level=3, prefix=prefix)
    ldm = compress_frame(data, level=3, prefix=prefix, enable_ldm=True)
    assert len(ldm) < len(plain) // 4, (len(ldm), len(plain))
    out, _ = decompress_frame(ldm, 0, prefix=prefix)
    assert out == data


def test_ldm_patch_mode_native():
    import random

    import pytest

    from zeekstd_tpu.native import loader

    if not loader.available():
        pytest.skip("native runtime unavailable")
    rng = random.Random(7)
    base = bytes(
        rng.randrange(65, 91) if i % 97 else 10 for i in range(600 << 10)
    )
    # low-entropy repetitive body defeats the short tables
    body = (b"field=alpha;field=beta;field=gamma;" * 20000)[: 600 << 10]
    prefix = bytes(a ^ 0 for a in body)
    data = bytearray(prefix)
    for i in range(0, len(data), 8192):
        data[i] = rng.randrange(256)
    data = bytes(data)
    plain = loader.compress_frame(data, prefix=prefix, level=3)
    ldm = loader.compress_frame(data, prefix=prefix, level=3, ldm=True)
    assert len(ldm) < len(plain), (len(ldm), len(plain))
    out, _ = loader.decompress_frame(ldm, len(data) + 64, prefix=prefix)
    assert out == data
