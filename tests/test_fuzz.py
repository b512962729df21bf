"""Randomized round-trip fuzzing, mirroring the reference's libFuzzer
targets (reference: fuzz/fuzz_targets/roundtrip_basic.rs and
roundtrip_seek.rs): arbitrary inputs with small frames must round-trip
losslessly, and decode-from-offset must equal the suffix. Runs across all
available backends."""

import io
import random

import pytest

from zeekstd_tpu import (
    BytesWrapper,
    DecodeOptions,
    EncodeOptions,
    Encoder,
    FrameSizePolicy,
)
from zeekstd_tpu.native import loader

BACKENDS = ["python"] + (["native"] if loader.available() else [])


def arbitrary_bytes(rng: random.Random, max_len=4096) -> bytes:
    n = rng.randrange(0, max_len)
    kind = rng.randrange(4)
    if kind == 0:
        return bytes(rng.randrange(256) for _ in range(n))
    if kind == 1:
        return bytes(rng.randrange(4) for _ in range(n))
    if kind == 2:
        pat = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 17)))
        return (pat * (n // max(len(pat), 1) + 1))[:n]
    words = [b"foo", b"bar", b"baz", b"quux" * 3]
    out = b""
    while len(out) < n:
        out += rng.choice(words)
    return out[:n]


def archive(data: bytes, backend: str, frame_size: int = 100) -> bytes:
    # 100-byte frames like the reference fuzz target (roundtrip_basic.rs:7-23).
    out = io.BytesIO()
    opts = (
        EncodeOptions()
        .with_backend(backend)
        .with_frame_size_policy(FrameSizePolicy.uncompressed(frame_size))
    )
    enc = Encoder(opts, out)
    enc.compress(data)
    enc.finish()
    return out.getvalue()


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(20))
def test_roundtrip_basic(backend, seed):
    rng = random.Random(seed)
    data = arbitrary_bytes(rng)
    blob = archive(data, backend)
    dec = DecodeOptions(BytesWrapper(blob)).with_backend(backend).into_decoder()
    assert dec.read(-1) == data


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(20))
def test_roundtrip_seek(backend, seed):
    # First fuzz bytes choose two offsets; decode window must equal the slice
    # (reference: roundtrip_seek.rs:8-43).
    rng = random.Random(1000 + seed)
    data = arbitrary_bytes(rng, 8192)
    if not data:
        return
    blob = archive(data, backend, frame_size=rng.choice([37, 100, 512]))
    a = rng.randrange(len(data) + 1)
    b = rng.randrange(len(data) + 1)
    lo, hi = min(a, b), max(a, b)
    dec = (
        DecodeOptions(BytesWrapper(blob))
        .with_backend(backend)
        .with_offset(lo)
        .with_offset_limit(hi)
        .into_decoder()
    )
    assert dec.read(-1) == data[lo:hi]


@pytest.mark.parametrize("seed", range(15))
def test_corrupt_archive_graceful(seed):
    # Arbitrary corruption anywhere in the archive must raise a taxonomy
    # error or produce a detected mismatch — never crash or hang
    # (BASELINE config 5: graceful error parity).
    from zeekstd_tpu.errors import ZeekstdError

    rng = random.Random(2000 + seed)
    data = arbitrary_bytes(rng, 4096)
    blob = bytearray(archive(data, "python", frame_size=256))
    for _ in range(rng.randrange(1, 6)):
        blob[rng.randrange(len(blob))] ^= 1 << rng.randrange(8)
    for backend in BACKENDS:
        try:
            dec = (
                DecodeOptions(BytesWrapper(bytes(blob)))
                .with_backend(backend)
                .into_decoder()
            )
            dec.read(-1)
        except ZeekstdError:
            pass
        except Exception as e:  # pragma: no cover
            pytest.fail(f"{backend}: non-taxonomy failure {e!r}")
