"""LZ77 match finding on TPU: fully parallel fast-level parse.

The host matcher (codec/match.py) walks hash chains position-by-position —
inherently serial. The TPU formulation decomposes the parse into vector
passes over the whole frame:

1. **Candidates**: stable-argsort positions by hash; the previous element
   inside a hash bucket is the nearest earlier occurrence — the same
   candidate a 1-deep hash table would return, found for *all* positions
   at once.
2. **Match lengths**: vectorized 4-byte word compares up to a cap, with
   mismatch refinement via XOR byte tests. Caps are healed in step 5.
3. **Greedy commit**: the greedy parse "jump to p + len" is a functional
   graph; reachability from position 0 (= the anchors the serial parse
   would visit) is computed with O(log n) pointer-jumping passes.
4. **Extraction**: literal/sequence streams come out via cumsum-based
   stream compaction — no sequential loop.
5. **Chain merge**: a capped long match reappears at the next anchor with
   the same offset and zero literals; merging those segments (segment-sum
   by cumsum ids) reconstructs full-length matches exactly.

Matches may reference any earlier frame position (the window), but never
cross a block boundary forward (``block_size`` cap), so sequences stay
block-local as the format requires. Output feeds ``ops.entropy`` encoders.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HASH_LOG = 16
MIN_MATCH = 4
MATCH_CAP = 64


def _load32(data_i32, p):
    """Gather the 4-byte little-endian word starting at byte p."""
    return data_i32[p]


def precompute_words(data_u8):
    """int32 word at every byte offset (padded at the tail)."""
    n = data_u8.shape[0]
    a = data_u8.astype(jnp.int32)

    def sh(k):
        z = jnp.zeros(k, jnp.int32)
        return jnp.concatenate([a[k:], z]) if k else a

    return sh(0) | (sh(1) << 8) | (sh(2) << 16) | (sh(3) << 24)


def hash_positions_tpu(data_u8):
    """Per-position hash of 6 bytes using 32-bit arithmetic."""
    w = precompute_words(data_u8).astype(jnp.uint32)
    n = data_u8.shape[0]
    a = data_u8.astype(jnp.uint32)
    z = jnp.zeros(6, jnp.uint32)
    b4 = jnp.concatenate([a[4:], z[:4]])
    b5 = jnp.concatenate([a[5:], z[:5]])
    hi = b4 | (b5 << 8)
    h = (w * jnp.uint32(0x9E3779B1)) ^ (hi * jnp.uint32(0x85EBCA77))
    return (h >> jnp.uint32(32 - HASH_LOG)).astype(jnp.int32)


def hash_positions_long(data_u8, span: int = 16):
    """Per-position hash of ``span`` bytes (the dfast-style long table):
    candidates that agree on 16 bytes find periodic/long matches that the
    short table misses when buckets are crowded with near matches."""
    words = precompute_words(data_u8).astype(jnp.uint32)
    n = data_u8.shape[0]
    h = jnp.zeros(n, jnp.uint32)
    primes = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F)
    for k in range(0, span, 4):
        wk = jnp.concatenate(
            [words[k:], jnp.zeros(min(k, n), jnp.uint32)]
        )[:n]
        h = (h ^ (wk * jnp.uint32(primes[(k // 4) % 4]))) * jnp.uint32(0x2545F491)
    return (h >> jnp.uint32(32 - HASH_LOG)).astype(jnp.int32)


def nearest_earlier_candidates(h, k: int = 1):
    """The k nearest earlier positions with the same hash (else -1).

    Stable argsort groups each bucket with ascending positions, so the
    j-th previous element within the bucket is the j-th nearest earlier
    occurrence — the parallel equivalent of walking a hash chain j deep.
    Returns int32[n] for k == 1, else int32[k, n].
    """
    n = h.shape[0]
    order = jnp.argsort(h, stable=True).astype(jnp.int32)
    h_sorted = h[order]
    outs = []
    for j in range(1, k + 1):
        prev_pos = jnp.concatenate(
            [jnp.full(j, -1, jnp.int32), order[:-j]]
        )
        same = jnp.concatenate(
            [jnp.zeros(j, bool), h_sorted[j:] == h_sorted[:-j]]
        )
        cand_sorted = jnp.where(same, prev_pos, -1)
        outs.append(jnp.zeros(n, jnp.int32).at[order].set(cand_sorted))
    if k == 1:
        return outs[0]
    return jnp.stack(outs)


def match_lengths(data_u8, cand, block_size: int, n_valid=None):
    """Vectorized match length (cap MATCH_CAP, truncated at block end and
    at the valid-data boundary)."""
    n = data_u8.shape[0]
    if n_valid is None:
        n_valid = n
    words = precompute_words(data_u8)
    p = jnp.arange(n, dtype=jnp.int32)
    block_end = (p // block_size + 1) * block_size
    limit = jnp.minimum(jnp.minimum(block_end, n_valid) - p, MATCH_CAP)
    c = jnp.maximum(cand, 0)

    mlen = jnp.zeros_like(cand)  # zeros_like keeps shard_map varying axes
    alive = cand >= 0

    def body(k, state):
        mlen, alive = state
        w1 = words[jnp.minimum(p + k, n - 1)]
        w2 = words[jnp.minimum(c + k, n - 1)]
        diff = (w1 ^ w2).astype(jnp.uint32)
        full = jnp.logical_and(alive, diff == 0)
        # Byte-level refinement of the first mismatching word.
        b0 = (diff & 0xFF) == 0
        b1 = (diff & 0xFFFF) == 0
        b2 = (diff & 0xFFFFFF) == 0
        partial = (
            b0.astype(jnp.int32) + b1.astype(jnp.int32) + b2.astype(jnp.int32)
        )
        add = jnp.where(full, 4, jnp.where(alive, partial, 0))
        mlen = mlen + add
        return mlen, jnp.logical_and(alive, full)

    mlen, _ = jax.lax.fori_loop(0, MATCH_CAP // 4, lambda i, s: body(i * 4, s), (mlen, alive))
    # Continuation score: words agreeing just past the cap. Used to break
    # ties between capped candidates — the one that keeps matching is the
    # true long/periodic match and keeps the merge chain intact.
    cont = jnp.zeros_like(mlen)
    for k in (MATCH_CAP, MATCH_CAP + 4, MATCH_CAP + 8, MATCH_CAP + 12):
        w1 = words[jnp.minimum(p + k, n - 1)]
        w2 = words[jnp.minimum(c + k, n - 1)]
        cont = cont + (w1 == w2).astype(jnp.int32)
    mlen = jnp.minimum(mlen, limit)
    valid = cand >= 0
    return jnp.where(valid, mlen, 0), jnp.where(valid, cont, 0)


def greedy_reachability(step, n: int):
    """Anchor mask: positions visited by the serial greedy parse
    (pointer-jumping transitive closure from position 0). Uses an explicit
    sink node at index n so a match ending exactly at the frame end does
    not falsely mark the final byte."""
    p = jnp.arange(n, dtype=jnp.int32)
    f = jnp.concatenate([jnp.minimum(p + step, n), jnp.full(1, n, jnp.int32)])
    # Derive from f so the carry keeps shard_map's varying manual axes.
    reach = (f * 0).at[0].set(1)
    n_doublings = max((n - 1).bit_length(), 1)

    def body(_, state):
        reach, f = state
        reach = reach.at[f].max(reach)
        return reach, f[f]

    reach, _ = jax.lax.fori_loop(0, n_doublings, body, (reach, f))
    return reach[:n].astype(bool)


def parse_frame(data_u8, block_size: int, seq_bound: int, n_valid=None):
    """Full parallel parse of one frame.

    Returns (lls, mls, offs int32[seq_bound]; n_seq; literals uint8[N];
    n_lit) — offsets are actual distances (no repeat codes); sequences are
    already merged across capped continuations; trailing literals are the
    final ll with ml=0 handled by the caller via n_lit accounting.
    """
    n = data_u8.shape[0]
    if n_valid is None:
        n_valid = n
    p = jnp.arange(n, dtype=jnp.int32)

    # Candidate set: 3-deep short-hash chain + the 16-byte long-hash table.
    # Selection maximizes (length, continuation-past-cap), nearest first on
    # exact ties — the parallel analog of a depth-4 chain search.
    h = hash_positions_tpu(data_u8)
    cands_s = nearest_earlier_candidates(h, k=2)
    h_l = hash_positions_long(data_u8)
    cands_l = nearest_earlier_candidates(h_l, k=3)

    cand, (mlen, cont) = cands_s[0], match_lengths(
        data_u8, cands_s[0], block_size, n_valid
    )
    for extra in (cands_s[1], cands_l[0], cands_l[1], cands_l[2]):
        m2, c2 = match_lengths(data_u8, extra, block_size, n_valid)
        better = jnp.logical_or(
            m2 > mlen, jnp.logical_and(m2 == mlen, c2 > cont)
        )
        cand = jnp.where(better, extra, cand)
        mlen = jnp.where(better, m2, mlen)
        cont = jnp.where(better, c2, cont)
    off = p - jnp.maximum(cand, 0)

    # Cost gate mirroring the host heuristic (match.py best_match).
    offbits = 32 - jnp.clip(
        jax.lax.clz(jnp.maximum(off, 1)), 0, 31
    )
    good = jnp.logical_and(mlen >= MIN_MATCH, 6 * mlen >= 14 + offbits)
    # Never start a match in the final MIN_MATCH tail of the valid region.
    good = jnp.logical_and(good, p < n_valid - MIN_MATCH)

    step = jnp.where(good, jnp.maximum(mlen, 1), 1)
    reach = greedy_reachability(step, n)

    is_seq = jnp.logical_and(reach, good)
    is_lit = jnp.logical_and(
        jnp.logical_and(reach, jnp.logical_not(good)), p < n_valid
    )

    # Literal stream compaction.
    lit_idx = jnp.cumsum(is_lit.astype(jnp.int32)) - is_lit.astype(jnp.int32)
    n_lit = jnp.sum(is_lit.astype(jnp.int32))
    literals = jnp.zeros(n, jnp.uint8)
    # Non-literal rows target index n (out of bounds -> dropped).
    literals = literals.at[jnp.where(is_lit, lit_idx, n)].set(data_u8, mode="drop")

    # Sequence stream compaction (raw, pre-merge).
    seq_idx = jnp.cumsum(is_seq.astype(jnp.int32)) - is_seq.astype(jnp.int32)
    n_seq_raw = jnp.sum(is_seq.astype(jnp.int32))
    LC = jnp.cumsum(is_lit.astype(jnp.int32))  # literals at positions <= p

    def scatter_seq(vals, fill):
        out = jnp.full(seq_bound, fill, jnp.int32)
        # Non-sequence rows (and overflow) target seq_bound -> dropped.
        tgt = jnp.where(is_seq, seq_idx, seq_bound)
        return out.at[tgt].set(vals, mode="drop")

    # lits-before-this-seq, per sequence.
    lc_at = scatter_seq(LC - is_lit.astype(jnp.int32), 0)  # exclusive count
    mls_raw = scatter_seq(jnp.where(is_seq, mlen, 0), 0)
    offs_raw = scatter_seq(jnp.where(is_seq, off, 1), 1)
    pos_raw = scatter_seq(p, 0)

    sidx = jnp.arange(seq_bound, dtype=jnp.int32)
    valid = sidx < n_seq_raw
    prev_lc = jnp.where(sidx > 0, jnp.roll(lc_at, 1), 0)
    lls_raw = jnp.where(valid, lc_at - prev_lc, 0)

    # Merge capped continuations: ll == 0, same offset, contiguous position.
    prev_off = jnp.roll(offs_raw, 1)
    prev_end = jnp.roll(pos_raw + mls_raw, 1)
    cont = jnp.logical_and(
        jnp.logical_and(lls_raw == 0, offs_raw == prev_off),
        jnp.logical_and(pos_raw == prev_end, sidx > 0),
    )
    # Never merge across a block boundary: sequences must stay block-local.
    cont = jnp.logical_and(cont, pos_raw % block_size != 0)
    cont = jnp.logical_and(cont, valid)
    seg_start = jnp.logical_and(valid, jnp.logical_not(cont))
    seg_id = jnp.cumsum(seg_start.astype(jnp.int32)) - 1
    n_seq = jnp.sum(seg_start.astype(jnp.int32))

    seg_tgt = jnp.where(valid, seg_id, seq_bound)
    mls = jnp.zeros(seq_bound, jnp.int32).at[seg_tgt].add(
        jnp.where(valid, mls_raw, 0), mode="drop"
    )
    lls = jnp.zeros(seq_bound, jnp.int32).at[seg_tgt].max(
        jnp.where(seg_start, lls_raw, 0), mode="drop"
    )
    offs = jnp.ones(seq_bound, jnp.int32).at[seg_tgt].max(
        jnp.where(seg_start, offs_raw, 1), mode="drop"
    )
    # n_seq_raw > seq_bound means sequences were dropped: the caller MUST
    # treat the parse as invalid and fall back.
    return lls, mls, offs, n_seq, literals, n_lit, n_seq_raw


parse_frame_jit = jax.jit(parse_frame, static_argnames=("block_size", "seq_bound"))
