"""Real-TPU kernel test lane (VERDICT round-4 weak #1).

Every other test pins the CPU backend and runs the Pallas kernels in
interpret mode — which zero-fills SMEM staging and therefore CANNOT
catch stale-staging / DMA-ordering bugs (docs/PERF.md; commits 0b8baa7
and 86a03d4 were exactly such real-TPU-only bugs). This lane runs the
serial kernels on the actual chip:

    ZEEKSTD_TPU_TESTS=1 python -m pytest tests/test_tpu_real.py -x -q

It is the documented pre-bench gate. Run ``python tools/prewarm.py``
first on a cold persistent cache; with a warm cache the lane finishes
in well under 5 minutes (cold Mosaic compiles for new shape buckets are
minutes each and dominate a first run).

Coverage: the serial match + FSE + ring/fused kernels on a
mixed-content corpus (kernel round-trip), a repeat-offset matrix of
libzstd-written frames (foreign-archive decode, rep-history semantics),
and a mutation soak (no silent wrong bytes on hostile inputs).
"""

import os
import random

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("ZEEKSTD_TPU_TESTS") != "1",
    reason="real-TPU lane: opt in with ZEEKSTD_TPU_TESTS=1",
)

if os.environ.get("ZEEKSTD_TPU_TESTS") == "1":
    import jax

    if jax.default_backend() == "cpu":  # pragma: no cover
        pytest.skip(
            "no TPU visible; the lane needs the real chip",
            allow_module_level=True,
        )


def mixed_corpus(n: int) -> bytes:
    """Every content class the fuzz suites use, in ONE archive shape so
    the lane reuses a single compile bucket: text, structured records,
    periodic (rep-heavy), random (incompressible), zeros (RLE), and
    base64-ish."""
    from .test_decompress import structured_data, text_data

    rng = random.Random(7)
    parts = []
    per = n // 6
    parts.append(text_data(per))
    parts.append(structured_data(per))
    parts.append(bytes(per))  # zeros -> RLE blocks
    parts.append(bytes(rng.randrange(256) for _ in range(64)) * (per // 64))
    parts.append(b"0123456789abcdef" * (per // 16))
    parts.append(text_data(per)[::-1])
    blob = b"".join(parts)
    return blob[:n].ljust(n, b"x")


FRAME = 2 << 20
CORPUS = 4 << 20


@pytest.fixture(scope="module")
def archive():
    from zeekstd_tpu.tpu_archive import tpu_compress_archive

    data = mixed_corpus(CORPUS)
    blob, st = tpu_compress_archive(data, frame_size=FRAME, level=1, checksum=True)
    return data, blob, st


def test_real_kernel_roundtrip(archive):
    """Serial match kernel -> FSE/Huffman encode -> ring decode, all on
    the chip, mixed corpus: bit-exact round trip, no serial fallback."""
    from zeekstd_tpu.tpu_archive import (
        serial_fallback_count,
        tpu_decompress_archive,
    )

    data, blob, st = archive
    before = serial_fallback_count()
    out = tpu_decompress_archive(blob, st)
    assert out == data
    assert serial_fallback_count() == before, "decode fell off the kernels"
    assert len(blob) < len(data), "mixed corpus must compress"


def test_real_oracle_decodes_archive(archive):
    """libzstd (ctypes oracle) decodes every chip-produced frame
    bit-exactly — the compat bar the reference proves against the C
    contrib implementation (lib/src/seek_table.rs:1156-1212)."""
    from .oracle import zstd_decompress

    data, blob, st = archive
    parts = []
    for i in range(st.num_frames):
        parts.append(
            zstd_decompress(
                blob[st.frame_start_comp(i) : st.frame_end_comp(i)],
                st.frame_size_decomp(i),
            )
        )
    assert b"".join(parts) == data


def test_real_repeat_offset_matrix():
    """Foreign (libzstd-written) frames with dense repeat-offset usage
    decode bit-exactly on the chip at several levels. Periodic data at
    coprime strides exercises rep1/rep2/rep3 and the ll==0 shift rule
    (RFC 8878 3.1.1.3.2.1.1) in the ring kernel's scalar loop."""
    from .oracle import zstd_compress
    from zeekstd_tpu.tpu_archive import tpu_decompress_archive

    rng = random.Random(11)
    base = bytes(rng.randrange(256) for _ in range(97))
    piece = (base * 600)[: 48 << 10]
    data = b"".join(
        [
            piece,
            (b"abcdefg" * 9000)[: 48 << 10],
            bytes(24 << 10),
            piece[::-1],
        ]
    )
    for level in (1, 3, 9):
        frame = zstd_compress(data, level=level)
        out = tpu_decompress_archive(frame)
        assert out == data, f"level {level} foreign decode mismatch"


def test_real_mutation_soak(archive):
    """Mutation corpus through the on-chip decoder: every hostile input
    errors or decodes intact — never silent wrong bytes (checksums on)."""
    from zeekstd_tpu.errors import ZeekstdError
    from zeekstd_tpu.tpu_archive import tpu_decompress_archive

    data, blob, st = archive
    rng = random.Random(13)
    silent = 0
    for _ in range(100):
        mutated = bytearray(blob)
        for _k in range(rng.randrange(1, 4)):
            mutated[rng.randrange(len(mutated))] ^= 1 << rng.randrange(8)
        try:
            out = tpu_decompress_archive(bytes(mutated), st)
        except (ZeekstdError, OverflowError, RuntimeError):
            continue
        if out != data:
            silent += 1
    assert silent == 0
