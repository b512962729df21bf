"""Randomized coverage matching the reference's proptest envelope
(reference: lib/src/lib.rs:315-357 — cycles with frame sizes 1..1024 and
frame counts up to 4096 under both policies, Cursor and BufReader source
variants; lib/src/seek_table.rs:1255-1266 — serializer with tiny output
buffers and serde cycles in both formats).

Seeded ``random`` keeps runs deterministic; the example counts are bounded
so the suite stays fast while sweeping the same parameter space.
"""

import io
import random

import pytest

from zeekstd_tpu import (
    BytesWrapper,
    DecodeOptions,
    EncodeOptions,
    FrameSizePolicy,
)
from zeekstd_tpu.seek_table import Format, SeekTable
from zeekstd_tpu.seekable import OffsetFrom, Seekable


class ShortReadWrapper(Seekable):
    """Seekable over bytes whose reads return at most ``cap`` bytes — the
    analog of the reference's BufReader short-read variant, which
    reproduced a real parse-corruption bug (seek_table.rs:1227-1229)."""

    def __init__(self, data: bytes, cap: int):
        self._inner = BytesWrapper(data)
        self._cap = cap

    def set_offset(self, offset: OffsetFrom) -> int:
        return self._inner.set_offset(offset)

    def read(self, n: int) -> bytes:
        return self._inner.read(min(n, self._cap) if n >= 0 else self._cap)

    def seek_table_integrity(self, fmt) -> bytes:
        return self._inner.seek_table_integrity(fmt)


def _payload(rng: random.Random, n: int) -> bytes:
    words = [b"alpha ", b"beta ", b"the ", b"of ", bytes([rng.randrange(256)])]
    out = bytearray()
    while len(out) < n:
        out += rng.choice(words)
    return bytes(out[:n])


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("policy_kind", ["uncompressed", "compressed"])
def test_random_cycle_both_policies(seed, policy_kind):
    rng = random.Random(1000 * seed + (policy_kind == "compressed"))
    frame_size = rng.randrange(1, 1025)
    # frame counts up to the reference's 4096 without quadratic runtime
    n = rng.randrange(0, min(frame_size * 512, 96_000))
    data = _payload(rng, n)

    policy = (
        FrameSizePolicy.uncompressed(frame_size)
        if policy_kind == "uncompressed"
        else FrameSizePolicy.compressed(frame_size)
    )
    buf = io.BytesIO()
    enc = (
        EncodeOptions()
        .with_frame_size_policy(policy)
        .with_checksum_flag(bool(rng.getrandbits(1)))
        .into_encoder(buf)
    )
    # tiny-step writes (reference: INPUT.len()/500 steps, lib.rs:92-93)
    step = max(1, n // rng.randrange(50, 500) if n else 1)
    for i in range(0, n, step):
        enc.write(data[i : i + step])
    enc.finish()
    archive = buf.getvalue()

    src = (
        BytesWrapper(archive)
        if rng.getrandbits(1)
        else ShortReadWrapper(archive, rng.randrange(1, 8))
    )
    dec = DecodeOptions(src).into_decoder()
    # tiny-step reads
    out = bytearray()
    rstep = rng.randrange(1, max(n // 37, 2)) if n else 1
    while True:
        chunk = dec.read(rstep)
        if not chunk:
            break
        out += chunk
    assert bytes(out) == data
    if policy_kind == "uncompressed" and n:
        st = SeekTable.from_seekable(BytesWrapper(archive))
        assert st.num_frames == -(-n // frame_size)


@pytest.mark.parametrize("seed", range(4))
def test_random_seek_suffix(seed):
    rng = random.Random(7000 + seed)
    frame_size = rng.randrange(1, 1025)
    n = rng.randrange(1, 48_000)
    data = _payload(rng, n)
    buf = io.BytesIO()
    enc = (
        EncodeOptions()
        .with_frame_size_policy(FrameSizePolicy.uncompressed(frame_size))
        .into_encoder(buf)
    )
    enc.write(data)
    enc.finish()
    dec = DecodeOptions(BytesWrapper(buf.getvalue())).into_decoder()
    for _ in range(6):
        off = rng.randrange(n)
        dec.set_offset(off)
        dec.set_offset_limit(n)
        assert dec.read(-1) == data[off:], (frame_size, off)


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("fmt", [Format.FOOT, Format.HEAD])
def test_serializer_random_tables_tiny_buffers(seed, fmt):
    # reference: seek_table.rs:1255-1266 — random counts, buffers 1..64,
    # serde cycles in both formats.
    rng = random.Random(31 * seed + int(fmt == Format.HEAD))
    n_frames = rng.randrange(0, 4097)
    st = SeekTable()
    expect = []
    for _ in range(n_frames):
        c, d = rng.randrange(1, 1025), rng.randrange(0, 1025)
        st.log_frame(c, d)
        expect.append((c, d))
    whole = st.to_bytes(fmt)

    ser = st.into_serializer() if fmt == Format.FOOT else None
    if ser is None:
        from zeekstd_tpu.seek_table import Serializer

        ser = Serializer(st, fmt)
    out = bytearray()
    while True:
        cap = rng.randrange(1, 65)
        buf = bytearray(cap)
        n = ser.write_into(buf)
        if n == 0:
            break
        out += buf[:n]
    assert bytes(out) == whole

    parsed = SeekTable.from_seekable_format(BytesWrapper(whole), fmt)
    assert parsed.num_frames == n_frames
    for i, (c, d) in enumerate(expect[: min(50, n_frames)]):
        assert parsed.frame_size_comp(i) == c
        assert parsed.frame_size_decomp(i) == d
    # short-read source variant
    parsed2 = SeekTable.from_seekable_format(
        ShortReadWrapper(whole, rng.randrange(1, 8)), fmt
    )
    assert parsed2.num_frames == n_frames
