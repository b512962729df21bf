"""Entropy coding on TPU: Huffman literal streams and FSE sequence streams.

Encode side:
- Huffman has no inter-symbol state, so encoding is a pure gather
  (byte -> code, nbits) plus the parallel bit packer — fully vectorized.
- FSE state chains are sequential per stream, so the three interleaved
  states run as one ``lax.scan`` over sequences (vectorizable across
  blocks/frames via vmap); bit placement stays parallel.

Decode side:
- Per-stream bit-serial chains run as scans, vectorized across the many
  independent streams the format provides (4 Huffman streams per block ×
  many blocks; one FSE stream per block). Frame/block independence is the
  parallel axis, as designed by the seekable format.

Tables are built host-side (they are tiny and variable-bit-serialized);
kernels consume dense arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .bitpack import pack_bits


def huffman_encode_bits(literals, codes, nbits):
    """Per-literal (value, nbits) in backward-stream write order (reversed
    literal order). literals: uint8[N]; codes: uint32[256]; nbits: int32[256].
    Padding literals must map to nbits 0 via the tables or a mask."""
    rev = literals[::-1].astype(jnp.int32)
    return codes[rev].astype(jnp.uint32), nbits[rev].astype(jnp.int32)


def huffman_encode_stream(literals, n_valid, codes, nbits, word_bound: int):
    """Encode one literal run into packed words (sentinel added host-side).

    literals: uint8[N_bound] with the valid prefix [0, n_valid).
    """
    n = literals.shape[0]
    # Reverse only the valid region: index j reads literal n_valid-1-j.
    idx = n_valid - 1 - jnp.arange(n, dtype=jnp.int32)
    valid = idx >= 0
    lit = literals[jnp.clip(idx, 0, n - 1)].astype(jnp.int32)
    vals = jnp.where(valid, codes[lit].astype(jnp.uint32), jnp.uint32(0))
    bits = jnp.where(valid, nbits[lit].astype(jnp.int32), 0)
    return pack_bits(vals, bits, word_bound)


huffman_encode_stream_jit = jax.jit(
    huffman_encode_stream, static_argnames=("word_bound",)
)


def huffman_decode_stream(words, start_bits, out_bound: int, table_symbol, table_nbits, max_bits):
    """Scan-decode one backward Huffman stream.

    words: uint32[W] little-endian packed stream (no sentinel — caller
    passes ``start_bits`` = payload bit length). table_*: dense decode
    tables of size 2**max_bits (static). Returns uint8[out_bound].
    """

    def read_at(rem, n):
        # bits [rem-n, rem) of the stream, zero-filled below position 0.
        lo = rem - n
        word_idx = lo >> 5
        sh = (lo & 31).astype(jnp.uint32)
        w0 = words[jnp.clip(word_idx, 0, words.shape[0] - 1)]
        w1 = words[jnp.clip(word_idx + 1, 0, words.shape[0] - 1)]
        both = w0.astype(jnp.uint32) >> sh
        both = both | jnp.where(
            sh == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - sh)
        )
        val = both & ((jnp.uint32(1) << jnp.uint32(n)) - 1)
        # Positions below 0 read as 0: shift out the underflow.
        pad = jnp.maximum(-lo, 0).astype(jnp.uint32)
        val = jnp.where(lo < 0, (val >> pad) << pad, val)
        return val

    def step(rem, _):
        peek = read_at(rem, max_bits).astype(jnp.int32)
        sym = table_symbol[peek]
        nb = table_nbits[peek].astype(jnp.int32)
        return rem - nb, sym

    _, syms = jax.lax.scan(step, start_bits, None, length=out_bound)
    return syms.astype(jnp.uint8)


def fse_encode_sequences(
    ll_codes, ml_codes, of_codes,
    ll_extra, ml_extra, of_extra,
    ll_extra_bits, ml_extra_bits, of_extra_bits,
    n_seq,
    ll_dnb, ll_dfs, ll_stt,
    ml_dnb, ml_dfs, ml_stt,
    of_dnb, of_dfs, of_stt,
    ll_log, ml_log, of_log,
    word_bound: int,
):
    """Encode one block's interleaved three-state FSE sequence bitstream.

    Inputs are per-sequence arrays padded to a static bound; ``n_seq`` is
    the dynamic count (>= 1). ``*_dnb``/``*_dfs``/``*_stt`` are the encode
    tables (delta_nb_bits, delta_find_state, state_table) as dense arrays;
    ``*_log`` the accuracy logs (traced scalars are fine).

    Returns (words uint32[word_bound], total_bits) — sentinel added by the
    host when finalizing the stream. Mirrors the host writer's item order
    (codec/seq_encode.py::encode_sequences_section).
    """
    S = ll_codes.shape[0]

    def init_state(dnb, dfs, stt, sym):
        nb = (dnb[sym] + (1 << 15)) >> 16
        value = (nb << 16) - dnb[sym]
        return stt[(value >> nb) + dfs[sym]].astype(jnp.int32)

    last = n_seq - 1
    ml_s0 = init_state(ml_dnb, ml_dfs, ml_stt, ml_codes[last])
    of_s0 = init_state(of_dnb, of_dfs, of_stt, of_codes[last])
    ll_s0 = init_state(ll_dnb, ll_dfs, ll_stt, ll_codes[last])

    # Scan i = n_seq-2 .. 0 over the *reversed* index space: step j encodes
    # sequence i = n_seq-2-j. Padded steps (i < 0) emit zero bits.
    def step(carry, j):
        ll_s, ml_s, of_s = carry
        i = n_seq - 2 - j
        on = i >= 0
        ci = jnp.clip(i, 0, S - 1)

        def enc(state, dnb, dfs, stt, sym):
            nb = (state + dnb[sym]) >> 16
            new = stt[(state >> nb) + dfs[sym]].astype(jnp.int32)
            return new, state, nb

        of_new, of_val, of_nb = enc(of_s, of_dnb, of_dfs, of_stt, of_codes[ci])
        ml_new, ml_val, ml_nb = enc(ml_s, ml_dnb, ml_dfs, ml_stt, ml_codes[ci])
        ll_new, ll_val, ll_nb = enc(ll_s, ll_dnb, ll_dfs, ll_stt, ll_codes[ci])

        ll_s = jnp.where(on, ll_new, ll_s)
        ml_s = jnp.where(on, ml_new, ml_s)
        of_s = jnp.where(on, of_new, of_s)

        zeros = jnp.int32(0)
        vals = jnp.stack([
            of_val.astype(jnp.int32), ml_val.astype(jnp.int32), ll_val.astype(jnp.int32),
            ll_extra[ci], ml_extra[ci], of_extra[ci],
        ])
        bits = jnp.stack([
            of_nb, ml_nb, ll_nb,
            ll_extra_bits[ci], ml_extra_bits[ci], of_extra_bits[ci],
        ])
        bits = jnp.where(on, bits, zeros)
        return (ll_s, ml_s, of_s), (vals, bits)

    # Unrolled scan body (8 sequences per step): scan-step dispatch
    # overhead dominates gather-bearing scans on this hardware.
    ENC_UNROLL = 8

    def step8(carry, t):
        outs = []
        for k in range(ENC_UNROLL):
            carry, o = step(carry, t * ENC_UNROLL + k)
            outs.append(o)
        return carry, (
            jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),
        )

    if S % ENC_UNROLL == 0 and S >= ENC_UNROLL:
        (ll_sf, ml_sf, of_sf), (step_vals, step_bits) = jax.lax.scan(
            step8, (ll_s0, ml_s0, of_s0),
            jnp.arange(S // ENC_UNROLL, dtype=jnp.int32),
        )
        step_vals = step_vals.reshape(S, 6)
        step_bits = step_bits.reshape(S, 6)
    else:
        (ll_sf, ml_sf, of_sf), (step_vals, step_bits) = jax.lax.scan(
            step, (ll_s0, ml_s0, of_s0), jnp.arange(S, dtype=jnp.int32)
        )

    li = jnp.clip(last, 0, S - 1)
    head_vals = jnp.stack([ll_extra[li], ml_extra[li], of_extra[li]])
    head_bits = jnp.stack([ll_extra_bits[li], ml_extra_bits[li], of_extra_bits[li]])
    tail_vals = jnp.stack([ml_sf, of_sf, ll_sf])
    tail_bits = jnp.stack([ml_log, of_log, ll_log])

    all_vals = jnp.concatenate([
        head_vals.astype(jnp.uint32),
        step_vals.reshape(-1).astype(jnp.uint32),
        tail_vals.astype(jnp.uint32),
    ])
    all_bits = jnp.concatenate([head_bits, step_bits.reshape(-1), tail_bits])
    return pack_bits(all_vals, all_bits, word_bound)


def fse_decode_sequences(
    words, start_bits, seq_bound: int, n_seq,
    ll_sym, ll_nb, ll_base,
    of_sym, of_nb, of_base,
    ml_sym, ml_nb, ml_base,
    ll_log, of_log, ml_log,
    ll_code_base, ll_code_bits, ml_code_base, ml_code_bits,
):
    """Scan-decode one block's sequence bitstream including repeat-offset
    resolution. Tables are dense per-state arrays (padded to max size).

    Returns (lls, mls, offsets) int32[seq_bound] with valid prefix n_seq.
    """

    def read_at(rem, n):
        lo = rem - n
        word_idx = lo >> 5
        sh = (lo & 31).astype(jnp.uint32)
        w0 = words[jnp.clip(word_idx, 0, words.shape[0] - 1)]
        w1 = words[jnp.clip(word_idx + 1, 0, words.shape[0] - 1)]
        both = (w0 >> sh) | jnp.where(sh == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - sh))
        nn = jnp.clip(n, 0, 31).astype(jnp.uint32)
        val = both & jnp.where(n >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << nn) - 1)
        return jnp.where(n <= 0, jnp.uint32(0), val).astype(jnp.int32)

    rem = start_bits
    ll_s = read_at(rem, ll_log)
    rem = rem - ll_log
    of_s = read_at(rem, of_log)
    rem = rem - of_log
    ml_s = read_at(rem, ml_log)
    rem = rem - ml_log

    def one_seq(carry, i):
        ll_s, of_s, ml_s, rem, r1, r2, r3 = carry
        on = i < n_seq

        of_code = of_sym[of_s].astype(jnp.int32)
        ml_code = ml_sym[ml_s].astype(jnp.int32)
        ll_code = ll_sym[ll_s].astype(jnp.int32)

        of_bits = of_code  # offset code == number of extra bits
        ofv = (jnp.int32(1) << of_code) + read_at(rem, of_bits)
        rem = rem - jnp.where(on, of_bits, 0)
        mlb = ml_code_bits[ml_code]
        ml = ml_code_base[ml_code] + read_at(rem, mlb)
        rem = rem - jnp.where(on, mlb, 0)
        llb = ll_code_bits[ll_code]
        ll = ll_code_base[ll_code] + read_at(rem, llb)
        rem = rem - jnp.where(on, llb, 0)

        # Repeat-offset resolution (RFC 8878 §3.1.1.3.2.1.1).
        idx = ofv + jnp.where(ll == 0, 1, 0)
        off_rep = jnp.select(
            [idx == 1, idx == 2, idx == 3, idx == 4],
            [r1, r2, r3, r1 - 1],
        )
        off = jnp.where(ofv > 3, ofv - 3, off_rep)
        nr1 = jnp.where(jnp.logical_or(ofv > 3, idx >= 2), off, r1)
        nr2 = jnp.where(jnp.logical_or(ofv > 3, idx >= 2), r1, r2)
        nr3 = jnp.where(jnp.logical_or(ofv > 3, jnp.logical_or(idx == 3, idx == 4)), r2, r3)
        r1 = jnp.where(on, nr1, r1)
        r2 = jnp.where(on, nr2, r2)
        r3 = jnp.where(on, nr3, r3)

        # State updates (skipped for the final sequence).
        upd = jnp.logical_and(on, i + 1 < n_seq)
        llnb = ll_nb[ll_s].astype(jnp.int32)
        ll_s2 = ll_base[ll_s].astype(jnp.int32) + read_at(rem, llnb)
        rem = rem - jnp.where(upd, llnb, 0)
        mlnb = ml_nb[ml_s].astype(jnp.int32)
        ml_s2 = ml_base[ml_s].astype(jnp.int32) + read_at(rem, mlnb)
        rem = rem - jnp.where(upd, mlnb, 0)
        ofnb = of_nb[of_s].astype(jnp.int32)
        of_s2 = of_base[of_s].astype(jnp.int32) + read_at(rem, ofnb)
        rem = rem - jnp.where(upd, ofnb, 0)
        ll_s = jnp.where(upd, ll_s2, ll_s)
        ml_s = jnp.where(upd, ml_s2, ml_s)
        of_s = jnp.where(upd, of_s2, of_s)

        out = (
            jnp.where(on, ll, 0),
            jnp.where(on, ml, 0),
            jnp.where(on, off, 1),
            jnp.where(on, ofv, 4),
        )
        return (ll_s, of_s, ml_s, rem, r1, r2, r3), out

    # Scan-step dispatch overhead dominates on this hardware (each step of
    # a scan with gathers costs ~10-100x the same ops unrolled), so the
    # scan body decodes UNROLL sequences serially and the scan runs
    # seq_bound/UNROLL steps. Semantics are identical: sub-iteration k of
    # step t is sequence t*UNROLL+k, including the final-sequence
    # no-state-update rule.
    UNROLL = 8
    assert seq_bound % UNROLL == 0 or seq_bound < UNROLL

    def step(carry, t):
        outs = []
        for k in range(UNROLL):
            carry, o = one_seq(carry, t * UNROLL + k)
            outs.append(o)
        stacked = tuple(
            jnp.stack([o[j] for o in outs]) for j in range(4)
        )
        return carry, stacked

    init = (ll_s, of_s, ml_s, rem, jnp.int32(1), jnp.int32(4), jnp.int32(8))
    if seq_bound < UNROLL:
        carry, (lls, mls, offs, ofvs) = jax.lax.scan(
            one_seq, init, jnp.arange(seq_bound, dtype=jnp.int32)
        )
    else:
        carry, (lls, mls, offs, ofvs) = jax.lax.scan(
            step, init, jnp.arange(seq_bound // UNROLL, dtype=jnp.int32)
        )
        lls, mls, offs, ofvs = (
            a.reshape(seq_bound) for a in (lls, mls, offs, ofvs)
        )
    # offs: offsets resolved against a fresh (1,4,8) repeat history — exact
    # for the first block of a frame; ofvs: raw offset values so callers can
    # re-resolve with the true cross-block repeat carry when ofv<=3 occurs.
    return lls, mls, offs, ofvs, carry[4:7]
