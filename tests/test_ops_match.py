"""TPU parallel match parse: the parse must reconstruct the input exactly
(validity) and produce block-contained sequences; quality is sanity-checked
against input entropy."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from zeekstd_tpu.ops.match_tpu import parse_frame_jit
from zeekstd_tpu.ops.seq_exec import execute_sequences_tpu

from .test_decompress import random_data, structured_data, text_data


def reconstruct(lls, mls, offs, n_seq, literals, n_lit, total):
    out = bytearray()
    lp = 0
    for i in range(n_seq):
        ll, ml, off = int(lls[i]), int(mls[i]), int(offs[i])
        out += literals[lp : lp + ll]
        lp += ll
        src = len(out) - off
        assert src >= 0, f"seq {i}: offset {off} beyond start"
        for _ in range(ml):
            out.append(out[src])
            src += 1
    out += literals[lp:n_lit]
    assert len(out) == total
    return bytes(out)


@pytest.mark.parametrize(
    "data",
    [
        text_data(30_000),
        structured_data(30_000),
        random_data(10_000),
        b"\x00" * 20_000,
        (b"pattern" * 3000)[:20_000],
    ],
    ids=["text", "struct", "random", "zeros", "periodic"],
)
def test_parse_reconstructs(data):
    arr = jnp.asarray(np.frombuffer(data, np.uint8))
    lls, mls, offs, n_seq, lits, n_lit, n_raw = parse_frame_jit(
        arr, block_size=8192, seq_bound=1 << 14
    )
    lls, mls, offs = np.asarray(lls), np.asarray(mls), np.asarray(offs)
    n_seq, n_lit = int(n_seq), int(n_lit)
    lits = bytes(np.asarray(lits))
    assert reconstruct(lls, mls, offs, n_seq, lits, n_lit, len(data)) == data


def test_block_containment():
    data = text_data(40_000)
    bs = 8192
    arr = jnp.asarray(np.frombuffer(data, np.uint8))
    lls, mls, offs, n_seq, lits, n_lit, n_raw = parse_frame_jit(
        arr, block_size=bs, seq_bound=1 << 14
    )
    # Walk output positions; no sequence's match may cross a block boundary.
    pos = 0
    for i in range(int(n_seq)):
        pos += int(lls[i])
        end = pos + int(mls[i])
        assert pos // bs == (end - 1) // bs or int(mls[i]) == 0
        pos = end


def test_merged_long_matches():
    # 20k of zeros: the merge pass must rebuild one long match per block,
    # not a chain of 64-byte stubs.
    data = b"\x00" * 20_000
    arr = jnp.asarray(np.frombuffer(data, np.uint8))
    lls, mls, offs, n_seq, lits, n_lit, n_raw = parse_frame_jit(
        arr, block_size=1 << 17, seq_bound=1 << 12
    )
    assert int(n_seq) <= 4
    assert int(np.asarray(mls).max()) > 15_000


def test_round_trip_through_seq_exec_kernel():
    # Parse on "device", execute on "device": end-to-end kernel pair.
    data = structured_data(16_384)
    arr = jnp.asarray(np.frombuffer(data, np.uint8))
    lls, mls, offs, n_seq, lits, n_lit, n_raw = parse_frame_jit(
        arr, block_size=8192, seq_bound=1 << 13
    )
    # Append trailing literals as a final ml=0 sequence.
    lls_np = np.asarray(lls).copy()
    used = int(np.asarray(lls)[: int(n_seq)].sum())
    trailing = int(n_lit) - used
    mls_np = np.asarray(mls).copy()
    offs_np = np.asarray(offs).copy()
    if trailing:
        lls_np[int(n_seq)] = trailing
        mls_np[int(n_seq)] = 0
        offs_np[int(n_seq)] = 1
    out, conv = execute_sequences_tpu(
        lits, jnp.asarray(lls_np), jnp.asarray(mls_np), jnp.asarray(offs_np), len(data)
    )
    assert bool(conv)
    assert bytes(np.asarray(out)) == data


def test_compression_quality_sanity():
    # The parallel parse should find most redundancy in repetitive text.
    data = text_data(50_000)
    arr = jnp.asarray(np.frombuffer(data, np.uint8))
    _, mls, _, n_seq, _, n_lit, _ = parse_frame_jit(
        arr, block_size=1 << 17, seq_bound=1 << 14
    )
    matched = int(np.asarray(mls).sum())
    assert matched > 0.9 * len(data)
    assert int(n_lit) < 0.1 * len(data)
