"""TPU sequence-execution kernel vs the host decoder (bit-exact)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from zeekstd_tpu.codec.match import MatchParams, MatchState, find_sequences
from zeekstd_tpu.ops.seq_exec import (
    execute_sequences_batch,
    execute_sequences_tpu_jit,
)

from .test_decompress import random_data, structured_data, text_data


def host_parse(data, level_params=MatchParams(depth=8, lazy=0, hash_bytes=5)):
    seqs, lits, _ = find_sequences(
        data, 0, len(data), level_params, MatchState(len(data)), (1, 4, 8)
    )
    # Resolve offset_values back to actual offsets, mirroring the decoder.
    reps = (1, 4, 8)
    out = []
    for s in seqs:
        ov, ll = s.offset_value, s.ll
        r1, r2, r3 = reps
        if ov > 3:
            off = ov - 3
            reps = (off, r1, r2)
        else:
            idx = ov + (1 if ll == 0 else 0)
            if idx == 1:
                off = r1
            elif idx == 2:
                off = r2
                reps = (r2, r1, r3)
            elif idx == 3:
                off = r3
                reps = (r3, r1, r2)
            else:
                off = r1 - 1
                reps = (off, r1, r2)
        out.append((s.ll, s.ml, off))
    return out, lits


def run_kernel(data, seq_bound=None, out_bound=None):
    seqs, lits = host_parse(bytes(data))
    trailing = len(data) - sum(ll + ml for ll, ml, _ in seqs)
    if trailing:
        seqs.append((trailing, 0, 1))
    seq_bound = seq_bound or max(len(seqs), 1)
    out_bound = out_bound or len(data)
    lls = np.zeros(seq_bound, np.int32)
    mls = np.zeros(seq_bound, np.int32)
    offs = np.ones(seq_bound, np.int32)
    for i, (ll, ml, off) in enumerate(seqs):
        lls[i], mls[i], offs[i] = ll, ml, off
    lit_arr = np.frombuffer(lits.ljust(max(len(lits), 1), b"\0"), np.uint8)
    out, conv = execute_sequences_tpu_jit(
        jnp.asarray(lit_arr), jnp.asarray(lls), jnp.asarray(mls), jnp.asarray(offs),
        out_bound,
    )
    assert bool(conv)
    return bytes(np.asarray(out)[: len(data)])


@pytest.mark.parametrize(
    "data",
    [
        text_data(5000),
        structured_data(20_000),
        random_data(3000),
        b"abababababababab" * 100,  # overlapping matches (offset < length)
        b"\x00" * 5000,  # RLE-like offset-1 chains
        text_data(70_000),
    ],
    ids=["text", "struct", "random", "overlap", "rle", "big"],
)
def test_matches_host(data):
    assert run_kernel(data) == bytes(data)


def test_padded_bounds():
    data = structured_data(10_000)
    assert run_kernel(data, seq_bound=4096, out_bound=16_384) == bytes(data)


def test_batch_vmap():
    datas = [text_data(8000), structured_data(8000), b"zyx" * 2667]
    out_bound = 8001
    lit_bound = 8001
    seq_bound = 2048
    L, A, B, C = [], [], [], []
    for d in datas:
        seqs, lits = host_parse(bytes(d))
        trailing = len(d) - sum(ll + ml for ll, ml, _ in seqs)
        if trailing:
            seqs.append((trailing, 0, 1))
        assert len(seqs) <= seq_bound
        lls = np.zeros(seq_bound, np.int32)
        mls = np.zeros(seq_bound, np.int32)
        offs = np.ones(seq_bound, np.int32)
        for i, (ll, ml, off) in enumerate(seqs):
            lls[i], mls[i], offs[i] = ll, ml, off
        L.append(np.frombuffer(lits.ljust(lit_bound, b"\0"), np.uint8))
        A.append(lls)
        B.append(mls)
        C.append(offs)
    out, conv = execute_sequences_batch(
        jnp.asarray(np.stack(L)), jnp.asarray(np.stack(A)),
        jnp.asarray(np.stack(B)), jnp.asarray(np.stack(C)), out_bound,
    )
    assert bool(np.asarray(conv).all())
    for row, d in zip(np.asarray(out), datas):
        assert bytes(row[: len(d)]) == bytes(d)
