"""Scan-free Huffman decoding via chunk speculation + map composition.

The per-symbol scan in ``ops.entropy.huffman_decode_stream`` is a long
sequential chain (one step per symbol). This module removes it:

1. Split the backward bitstream into fixed chunks of C bits. A Huffman
   code is at most 11 bits, so the decode position entering chunk k is
   always within [0, 11) bits of the chunk boundary (the "spill" of the
   code that straddled it).
2. **Speculate**: decode every chunk from all 11 possible entry spills in
   parallel — a short bounded loop of at most C steps, vectorized over
   (chunks x 11) lanes. Record each lane's symbols, symbol count, and
   exit spill.
3. **Compose**: each chunk yields an 11-entry map spill_in -> spill_out;
   ``jax.lax.associative_scan`` over chunks (function composition by
   gather) gives every chunk's true entry spill in O(log K) depth.
4. **Extract**: select each chunk's true lane, prefix-sum the symbol
   counts for output offsets, and scatter the symbols.

Total work is ~11x the serial decode but with *no* sequential dependency
longer than one chunk — the formulation that reaches HBM-bandwidth decode
on a vector machine. The same technique extends to FSE streams (the spill
domain becomes the FSE state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_CODE_BITS = 11
SPILLS = MAX_CODE_BITS  # entry spill in [0, MAX_CODE_BITS)


def decode_stream_spec(
    words,
    start_bits,
    out_bound: int,
    table_symbol,
    table_nbits,
    max_bits,
    chunk_bits: int = 264,
):
    """Decode one backward Huffman stream without a per-symbol scan.

    words: uint32[W] packed stream; start_bits: payload bit length (traced);
    table_*: dense decode tables padded to 2048 entries; max_bits: traced
    table log. Returns (symbols uint8[out_bound], n_symbols) — symbols
    beyond the true count are garbage for the caller to slice off.
    """
    C = chunk_bits
    W = words.shape[0]
    K = (W * 32 + C - 1) // C  # static chunk-count bound

    def read_at(lo, n):
        # bits [lo, lo+n) of the stream; negative positions read 0.
        word_idx = lo >> 5
        sh = (lo & 31).astype(jnp.uint32)
        w0 = words[jnp.clip(word_idx, 0, W - 1)]
        w1 = words[jnp.clip(word_idx + 1, 0, W - 1)]
        both = (w0 >> sh) | jnp.where(
            sh == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - sh)
        )
        val = both & ((jnp.uint32(1) << jnp.uint32(n)) - 1)
        pad = jnp.clip(-lo, 0, 31).astype(jnp.uint32)
        val = jnp.where(lo < 0, (val >> pad) << pad, val)
        return jnp.where(lo <= -n, jnp.uint32(0), val)

    max_syms = C  # a chunk decodes at most C symbols (codes are >= 1 bit)

    def decode_lane(k, s):
        """Speculatively decode chunk k entered with spill s."""
        # Chunk k covers bit positions (top-down): [start - (k+1)*C, start - k*C)
        top = start_bits - k * C - s  # first unread bit position (exclusive)
        bottom = start_bits - (k + 1) * C
        # Decode while the code *starts* within this chunk: position > bottom.
        def body(carry, _):
            pos, count = carry
            active = pos > jnp.maximum(bottom, 0)
            peek = read_at(pos - max_bits, max_bits).astype(jnp.int32)
            # read_at gives bits [pos-max_bits, pos): the decoder peeks the
            # TOP max_bits bits below pos.
            sym = table_symbol[jnp.clip(peek, 0, 2047)]
            nb = table_nbits[jnp.clip(peek, 0, 2047)].astype(jnp.int32)
            new_pos = jnp.where(active, pos - nb, pos)
            out_sym = jnp.where(active, sym, -1)
            return (new_pos, count + active.astype(jnp.int32)), out_sym

        (pos_f, count), syms = jax.lax.scan(
            body, (top, jnp.int32(0)), None, length=max_syms
        )
        spill_out = (bottom - pos_f).astype(jnp.int32)  # bits consumed of next chunk
        return syms.astype(jnp.int8), count, jnp.clip(spill_out, 0, SPILLS - 1)

    ks = jnp.arange(K, dtype=jnp.int32)
    ss = jnp.arange(SPILLS, dtype=jnp.int32)
    syms_all, counts_all, spill_all = jax.vmap(
        lambda k: jax.vmap(lambda s: decode_lane(k, s))(ss)
    )(ks)
    # syms_all: (K, SPILLS, max_syms) int8; counts/spill: (K, SPILLS)

    # Compose spill maps over chunks: entry spill of chunk 0 is 0.
    def combine(f, g):
        # (f then g) as maps: out[s] = g[f[s]] — scan carries "map from
        # stream start to exit of this chunk".
        return jnp.take_along_axis(g, f, axis=-1)

    # maps: (K, SPILLS) int32, map[k][s] = exit spill of chunk k entered at s.
    comp = jax.lax.associative_scan(combine, spill_all, axis=0)
    # Entry spill of chunk k = composed exit of chunks [0, k): shift right.
    entry = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), comp[:-1, 0].astype(jnp.int32)]
    )

    true_counts = jnp.take_along_axis(counts_all, entry[:, None], axis=1)[:, 0]
    true_syms = jnp.take_along_axis(
        syms_all, entry[:, None, None], axis=1
    )[:, 0, :]  # (K, max_syms)

    # Scatter symbols to their output positions.
    offsets = jnp.cumsum(true_counts) - true_counts
    pos_in_chunk = jnp.arange(max_syms, dtype=jnp.int32)[None, :]
    out_pos = offsets[:, None] + pos_in_chunk
    valid = pos_in_chunk < true_counts[:, None]
    tgt = jnp.where(valid, out_pos, out_bound)
    out = jnp.zeros(out_bound, jnp.uint8)
    out = out.at[tgt.reshape(-1)].set(
        true_syms.reshape(-1).astype(jnp.uint8), mode="drop"
    )
    return out, jnp.sum(true_counts)


decode_stream_spec_jit = jax.jit(
    decode_stream_spec, static_argnames=("out_bound", "chunk_bits")
)


def decode_stream_bitreach(
    words,
    start_bits,
    out_bound: int,
    table_symbol,
    table_nbits,
    max_bits,
    interpret: bool = False,
):
    """Decode one backward Huffman stream with NO per-symbol loop at all.

    The chunk-speculation scan above still walks symbols sequentially
    within a chunk — a ``lax.scan`` whose body gathers, the slowest shape
    on this hardware. This formulation removes the loop entirely:

    1. Peek windows at EVERY bit offset come from 32 static shifts of the
       word array (pure elementwise — no gather), flipped/rolled into
       "distance from stream top" coordinates.
    2. One packed table lookup per bit position gives (symbol, nbits);
       ``nbits`` is the step of a forward chain over bit positions whose
       visited set is exactly the decoded symbol sequence.
    3. Code steps are <= 11 bits, so the chain is local: the Mosaic
       chunked reachability kernel (ops/pallas_kernels.reachability_chunked,
       built for the encoder's greedy parse) marks the chain positions.
    4. Symbols compact to the output by cumsum + scatter.

    Same signature/result as ``decode_stream_spec``.
    """
    from .pallas_kernels import reachability_chunked

    W = words.shape[0]
    n_reach = max(-(-W * 32 // 1024) * 1024, 1024)  # kernel tile granularity
    mb = max_bits.astype(jnp.uint32)

    # Peek value ending at stream bit b, for all b, via static shifts:
    # ext bit t == stream bit t-32 (one zero word below bit 0 reproduces
    # the zero-fill of codes that read past the stream bottom).
    ext = jnp.concatenate([jnp.zeros(1, jnp.uint32), words.astype(jnp.uint32)])
    w1 = jnp.concatenate([ext[1:], jnp.zeros(1, jnp.uint32)])
    win = [ext & jnp.uint32(0x7FF)]
    for sh in range(1, 32):
        win.append(
            ((ext >> jnp.uint32(sh)) | (w1 << jnp.uint32(32 - sh)))
            & jnp.uint32(0x7FF)
        )
    allv = jnp.stack(win, axis=1).reshape(-1)  # allv[t] = ext bits [t, t+11)

    # Chain position p (symbols decoded top-down) peeks stream bits
    # [start_bits - p - max_bits, start_bits - p) = allv[base - p] with
    # base = start_bits + 32 - max_bits; flip + roll turns the reversed
    # traced indexing into elementwise ops.
    L = allv.shape[0]
    flipped = allv[::-1]
    if L < n_reach:
        flipped = jnp.concatenate([flipped, jnp.zeros(n_reach - L, jnp.uint32)])
    base = start_bits + 32 - max_bits
    peek = jnp.roll(flipped, -(L - 1 - base))[:n_reach]
    peek = peek & ((jnp.uint32(1) << mb) - 1)

    packed_tab = (table_symbol.astype(jnp.int32) & 0xFF) | (
        jnp.clip(table_nbits.astype(jnp.int32), 1, 31) << 8
    )
    packed = jnp.take(packed_tab, jnp.clip(peek.astype(jnp.int32), 0, 2047))
    sym = (packed & 0xFF).astype(jnp.uint8)
    step = packed >> 8  # in [1, 11] for well-formed tables

    reach = reachability_chunked(step, n_reach, n_reach, interpret=interpret)
    p = jnp.arange(n_reach, dtype=jnp.int32)
    emit = jnp.logical_and(reach, p < start_bits)
    n_sym = jnp.sum(emit.astype(jnp.int32))
    idx = jnp.cumsum(emit.astype(jnp.int32)) - emit.astype(jnp.int32)
    out = jnp.zeros(out_bound, jnp.uint8)
    out = out.at[jnp.where(emit, idx, out_bound)].set(sym, mode="drop")
    return out, n_sym
