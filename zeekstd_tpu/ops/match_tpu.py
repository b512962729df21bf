"""LZ77 match finding on TPU: fully parallel fast-level parse.

The host matcher (codec/match.py) walks hash chains position-by-position —
inherently serial. The TPU formulation decomposes the parse into vector
passes over the whole frame:

1. **Candidates**: stable-argsort positions by hash; the j-th previous
   element inside a hash bucket is the j-th nearest earlier occurrence —
   the same candidates a j-deep hash chain would return, found for *all*
   positions at once.
2. **Match lengths in sorted order**: word strips ``W_k[i] = words[order[i]
   + k]`` are gathered ONCE per word offset k; the candidate's words are
   then just the strip shifted by j rows, so every depth's match length is
   computed from the same strips with cheap shifted compares. (The earlier
   formulation gathered candidate words per depth per k inside a
   ``fori_loop`` — two orders of magnitude slower on this hardware, where
   XLA While bodies defeat fusion; everything here is unrolled.)
3. **Greedy commit**: the greedy parse "jump to p + len" is a functional
   graph; reachability from position 0 (= the anchors the serial parse
   would visit) is computed with O(log n) unrolled pointer-jumping passes.
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

import os as _os

import jax
import jax.numpy as jnp

HASH_LOG = 16
MIN_MATCH = 4
MATCH_CAP = 32
CONT_WORDS = 2  # words compared past the cap for the merge tie-break


def precompute_words(data_u8):
    """int32 word at every byte offset (padded at the tail)."""
    a = data_u8.astype(jnp.int32)

    def sh(k):
        z = jnp.zeros(k, jnp.int32)
        return jnp.concatenate([a[k:], z]) if k else a

    return sh(0) | (sh(1) << 8) | (sh(2) << 16) | (sh(3) << 24)


def hash_positions_tpu(data_u8):
    """Per-position hash of 6 bytes using 32-bit arithmetic."""
    w = precompute_words(data_u8).astype(jnp.uint32)
    a = data_u8.astype(jnp.uint32)
    z = jnp.zeros(6, jnp.uint32)
    b4 = jnp.concatenate([a[4:], z[:4]])
    b5 = jnp.concatenate([a[5:], z[:5]])
    hi = b4 | (b5 << 8)
    h = (w * jnp.uint32(0x9E3779B1)) ^ (hi * jnp.uint32(0x85EBCA77))
    return (h >> jnp.uint32(32 - HASH_LOG)).astype(jnp.int32)


def hash_positions_4(data_u8):
    """Per-position hash of exactly 4 bytes: numeric/structured data
    lives on 4-5 byte matches that the 6-byte hash never buckets together
    (same fix as the native runtime's near probe)."""
    w = precompute_words(data_u8).astype(jnp.uint32)
    h = w * jnp.uint32(2654435761)
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


def _shift_down(a, j, fill):
    """a shifted j rows toward higher indices (row i takes a[i-j])."""
    return jnp.concatenate([jnp.full(j, fill, a.dtype), a[:-j]])


def sorted_hash_matches(data_u8, h, depths: int, block_size: int, n_valid,
                        cap: int = MATCH_CAP, cont_words: int = CONT_WORDS):
    """Best candidate among the ``depths`` nearest earlier same-hash
    positions, with vectorized match lengths.

    Strips are gathered once (cap/4 + cont_words gathers total); each
    depth j compares a strip against itself shifted by j rows — the sorted
    order makes "candidate's words" a shift instead of a gather. Returns
    (cand, mlen, cont) in position space. ``cap`` bounds the measured
    match length (longer matches re-emerge at the next anchor and are
    merged exactly), so it trades strip-gather traffic — the dominant
    cost on this hardware — against selection quality only.
    """
    n = data_u8.shape[0]
    words = precompute_words(data_u8)
    order = jnp.argsort(h, stable=True).astype(jnp.int32)

    # Probes past the cap serve two roles. *Extension* probes (contiguous
    # words right after the cap) lengthen cap-length matches at word
    # granularity — rounding DOWN, so the measured length is always a true
    # match length. A *far* probe (~3x the cap away) is a selection
    # tie-break only: among still-tied candidates, one that also matches
    # far ahead is the continuation the capped-match merge needs on
    # periodic text.
    if cont_words == 1:
        ext_ks = [cap // 4, cap // 4 + 1]
        far_ks = [cap // 4 + 7]
    else:
        ext_ks = []
        far_ks = [cap // 4 + i for i in range(cont_words)]
    strip_ks = list(range(cap // 4)) + ext_ks + far_ks

    # ONE row gather for all strips + the sorted hashes. XLA's TPU gather
    # cost is per-index, not per-byte: gathering (n, K+1) rows costs about
    # the same as one 1-D gather, where K separate strip gathers cost K
    # times as much (measured ~6x on this chip for K=7).
    cols = []
    for k in strip_ks:
        if k == 0:
            cols.append(words)
        else:
            kk = min(4 * k, n)
            fill = jnp.broadcast_to(words[n - 1], (kk,))
            cols.append(jnp.concatenate([words[kk:], fill]))
    cols.append(h)
    sm = jnp.stack(cols, axis=1)[order]  # (n, K+1)
    strips = [sm[:, i] for i in range(len(strip_ks))]
    h_s = sm[:, len(strip_ks)]

    # Per-row (sorted order) match-length limit at the owning position.
    block_end = (order // block_size + 1) * block_size
    mlen_max = cap + 4 * len(ext_ks)
    limit = jnp.minimum(jnp.minimum(block_end, n_valid) - order, mlen_max)

    best_cand = jnp.full(n, -1, jnp.int32)
    best_mlen = jnp.zeros(n, jnp.int32)
    best_cont = jnp.zeros(n, jnp.int32)
    for j in range(1, depths + 1):
        same = jnp.concatenate(
            [jnp.zeros(j, bool), h_s[j:] == h_s[:-j]]
        )
        cand = jnp.where(same, _shift_down(order, j, 0), -1)
        # Unrolled word compares: byte-refined first mismatching word.
        mlen = jnp.zeros(n, jnp.int32)
        alive = same
        for k in range(cap // 4):
            diff = (strips[k] ^ _shift_down(strips[k], j, -1)).astype(jnp.uint32)
            full = jnp.logical_and(alive, diff == 0)
            partial = (
                ((diff & 0xFF) == 0).astype(jnp.int32)
                + ((diff & 0xFFFF) == 0).astype(jnp.int32)
                + ((diff & 0xFFFFFF) == 0).astype(jnp.int32)
            )
            mlen = mlen + jnp.where(full, 4, jnp.where(alive, partial, 0))
            alive = full
        # Word-granular exact extension past the cap (cumulative AND keeps
        # it a true prefix match), then far-probe continuation tie-break.
        run = alive.astype(jnp.int32)
        si = cap // 4
        for _ in ext_ks:
            eq = (strips[si] == _shift_down(strips[si], j, -1)).astype(jnp.int32)
            run = run * eq
            mlen = mlen + 4 * run
            si += 1
        cont = jnp.zeros(n, jnp.int32)
        for _ in far_ks:
            eq = (strips[si] == _shift_down(strips[si], j, -1)).astype(jnp.int32)
            run = run * eq
            cont = cont + run
            si += 1
        mlen = jnp.where(same, jnp.minimum(mlen, limit), 0)
        cont = jnp.where(same, cont, 0)
        better = jnp.logical_or(
            mlen > best_mlen,
            jnp.logical_and(mlen == best_mlen, cont > best_cont),
        )
        best_cand = jnp.where(better, cand, best_cand)
        best_mlen = jnp.where(better, mlen, best_mlen)
        best_cont = jnp.where(better, cont, best_cont)

    # Back to position space — one packed scatter instead of three when
    # the fields fit an int32 (cand+1 up to 2^22, mlen 6 bits, cont 2).
    if n <= (1 << 22) and mlen_max <= 63 and len(far_ks) <= 3:
        packed = (
            ((best_cand + 1) << 8)
            | (best_mlen << 2)
            | jnp.minimum(best_cont, 3)
        )
        out = jnp.zeros(n, jnp.int32).at[order].set(packed)
        return (out >> 8) - 1, (out >> 2) & 63, out & 3
    out_c = jnp.full(n, -1, jnp.int32).at[order].set(best_cand)
    out_m = jnp.zeros(n, jnp.int32).at[order].set(best_mlen)
    out_k = jnp.zeros(n, jnp.int32).at[order].set(best_cont)
    return out_c, out_m, out_k


def greedy_reachability(step, n: int, block_size: int | None = None,
                        step_max: int | None = None):
    """Anchor mask: positions visited by the serial greedy parse
    (pointer-jumping transitive closure from position 0). Uses an explicit
    sink node so a match ending exactly at the frame end does not falsely
    mark the final byte. Unrolled: While-loop bodies lower poorly on this
    hardware. (A compacted good-position variant was tried and reverted:
    ~98% of text positions carry a qualifying candidate, so there is
    nothing to compact.)

    When ``step_max`` (the parse's match cap) is small, chains are local
    and the Mosaic chunked path applies on TPU: per-128-byte-chunk pointer
    tables in registers + MXU map composition + binary-lifting mark
    (ops/pallas_kernels.reachability_chunked) — it replaces the
    log2(block) full-size gather/scatter rounds that otherwise dominate
    the whole parse.

    When ``block_size`` is given, steps are guaranteed never to cross a
    multiple of it (the parse caps match lengths at the block end), so
    every block start is an anchor and reachability factors into
    independent ``block_size`` rows: log2(block) instead of log2(n)
    doubling levels, with row-local gathers/scatters — measured ~35%
    faster than the global pass on the target chip.
    """
    from .pallas_kernels import CHUNK, SMAX, reachability_chunked

    eff_block = min(block_size, n) if block_size else n
    if (
        step_max is not None
        and step_max <= SMAX
        and n % CHUNK == 0
        and eff_block % CHUNK == 0
        and n % eff_block == 0
        and (eff_block // CHUNK) & (eff_block // CHUNK - 1) == 0
        and (n // CHUNK) % 8 == 0
        and jax.default_backend() == "tpu"
        and _os.environ.get("ZEEKSTD_TPU_REACH") != "xla"
    ):
        return reachability_chunked(step, n, eff_block)
    if block_size is None or block_size >= n:
        p = jnp.arange(n, dtype=jnp.int32)
        f = jnp.concatenate([jnp.minimum(p + step, n), jnp.full(1, n, jnp.int32)])
        # Derive from f so the carry keeps shard_map's varying manual axes.
        reach = (f * 0).at[0].set(1)
        for _ in range(max((n - 1).bit_length(), 1)):
            reach = reach.at[f].max(reach)
            f = f[f]
        return reach[:n].astype(bool)

    nb = -(-n // block_size)
    pad = nb * block_size - n
    if pad:
        step = jnp.concatenate([step, jnp.ones(pad, jnp.int32)])
    s = step.reshape(nb, block_size)
    p = jnp.arange(block_size, dtype=jnp.int32)[None, :]
    f = jnp.minimum(p + s, block_size)
    f = jnp.concatenate([f, jnp.full((nb, 1), block_size, jnp.int32)], axis=1)
    reach = (f * 0).at[:, 0].set(1)
    rows = jnp.arange(nb, dtype=jnp.int32)[:, None]
    for _ in range(max((block_size - 1).bit_length(), 1)):
        reach = reach.at[rows, f].max(reach)
        f = jnp.take_along_axis(f, f, axis=1)
    return reach[:, :block_size].reshape(nb * block_size)[:n].astype(bool)


def level_depths(level: int):
    """TPU level knob: (short-chain depth, long-chain depth) — the parallel
    analog of libzstd's per-level search depth (reference level range:
    cli/src/args.rs:191-193). Level 1 is a single-table speed level (no
    16-byte long-hash pass), matching libzstd's ``fast`` strategy and the
    native runtime's level 1: each sorted-hash pass costs one argsort +
    one (n, K) strip row-gather + one scatter, so dropping the long pass
    removes ~a third of the parse's device time."""
    if level <= 1:
        return 1, 0
    if level <= 4:
        return 2, 3
    return 4, 6


def level_cap(level: int):
    """(match-length cap, continuation words) per level: fast levels halve
    the strip-gather traffic (the parse's dominant cost on this chip);
    capped matches re-merge exactly, so only selection tie-breaks differ."""
    if level <= 4:
        return 16, 1
    return MATCH_CAP, CONT_WORDS


def parse_frame(data_u8, block_size: int, seq_bound: int, n_valid=None, level: int = 3,
                start: int = 0):
    """Full parallel parse of one frame.

    Returns (lls, mls, offs int32[seq_bound]; n_seq; literals uint8[N];
    n_lit) — offsets are actual distances (repeat-offset coding is applied
    by the consumers via ``rep1_offset_values``); sequences are already
    merged across capped continuations; trailing literals are the final ll
    with ml=0 handled by the caller via n_lit accounting.

    ``start`` (a multiple of block_size) marks a dictionary/prefix region
    data_u8[:start]: positions there may SOURCE matches but emit neither
    sequences nor literals — the TPU form of CCtx::ref_prefix (reference
    lib/src/encode.rs:332-338).
    """
    n = data_u8.shape[0]
    if n_valid is None:
        n_valid = n
    assert start % block_size == 0, "prefix must be block-aligned"
    p = jnp.arange(n, dtype=jnp.int32)

    # Candidate set: level-scaled short-hash chain + 16-byte long-hash
    # chain. Selection maximizes (length, continuation-past-cap), nearest
    # first on exact ties — the parallel analog of a deep chain search.
    ds, dl = level_depths(level)
    cap, cw = level_cap(level)
    h = hash_positions_tpu(data_u8)
    cand, mlen, cont = sorted_hash_matches(
        data_u8, h, ds, block_size, n_valid, cap=cap, cont_words=cw
    )
    if dl > 0:
        h_l = hash_positions_long(data_u8)
        cand_l, mlen_l, cont_l = sorted_hash_matches(
            data_u8, h_l, dl, block_size, n_valid, cap=cap, cont_words=cw
        )
        better = jnp.logical_or(
            mlen_l > mlen, jnp.logical_and(mlen_l == mlen, cont_l > cont)
        )
        cand = jnp.where(better, cand_l, cand)
        mlen = jnp.where(better, mlen_l, mlen)
        cont = jnp.where(better, cont_l, cont)
    if level >= 2:
        # 4-byte near pass (depth 1): the only finder of the short matches
        # structured data is made of; the cost gate below keeps far short
        # matches out exactly as on the host paths.
        h4 = hash_positions_4(data_u8)
        cand_4, mlen_4, cont_4 = sorted_hash_matches(
            data_u8, h4, 1, block_size, n_valid, cap=cap, cont_words=cw
        )
        better4 = jnp.logical_or(
            mlen_4 > mlen, jnp.logical_and(mlen_4 == mlen, cont_4 > cont)
        )
        cand = jnp.where(better4, cand_4, cand)
        mlen = jnp.where(better4, mlen_4, mlen)
        cont = jnp.where(better4, cont_4, cont)
    off = p - jnp.maximum(cand, 0)

    # Cost gate mirroring the host heuristic (match.py best_match).
    offbits = 32 - jnp.clip(
        jax.lax.clz(jnp.maximum(off, 1)), 0, 31
    )
    good = jnp.logical_and(mlen >= MIN_MATCH, 6 * mlen >= 14 + offbits)
    # Never start a match in the final MIN_MATCH tail of the valid region.
    good = jnp.logical_and(good, p < n_valid - MIN_MATCH)
    if start:
        # Prefix region: match sources only — no sequences, no literals.
        good = jnp.logical_and(good, p >= start)

    step = jnp.where(good, jnp.maximum(mlen, 1), 1)
    mlen_max = cap + (8 if cw == 1 else 0)
    reach = greedy_reachability(step, n, block_size, step_max=mlen_max)

    is_seq = jnp.logical_and(reach, good)
    is_lit = jnp.logical_and(
        jnp.logical_and(reach, jnp.logical_not(good)),
        jnp.logical_and(p < n_valid, p >= start) if start else p < n_valid,
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


def rep1_offset_values(lls_pos, lls_written, mls, offs, n_seq, block_size: int, seq_bound: int):
    """Offset VALUES with repeat-offset coding: sequence i emits rep code 1
    (ofv = 1) when its offset equals the previous sequence's offset, its
    written literal length is nonzero, and both matches start in the same
    block. Restricting to same-block rep1 keeps per-block fresh-history
    decoding exact and is immune to raw-block fallbacks (a skipped block
    never breaks the chain the code relies on). Everything else emits the
    actual offset + 3 (RFC 8878 §3.1.1.3.2.1.1).

    ``lls_pos``: frame-order literal lengths (positions derive from these);
    ``lls_written``: the block-clamped lls the bitstream will carry (the
    ll==0 repeat-index shift applies to these)."""
    sidx = jnp.arange(seq_bound, dtype=jnp.int32)
    out_len = lls_pos + mls
    starts = jnp.cumsum(out_len) - out_len
    mstart = starts + lls_pos
    prev_off = jnp.roll(offs, 1)
    prev_m = jnp.roll(mstart, 1)
    same_block = (mstart // block_size) == (prev_m // block_size)
    is_rep = jnp.logical_and(
        jnp.logical_and(sidx > 0, sidx < n_seq),
        jnp.logical_and(
            jnp.logical_and(offs == prev_off, lls_written > 0), same_block
        ),
    )
    return jnp.where(is_rep, 1, offs + 3)


parse_frame_jit = jax.jit(parse_frame, static_argnames=("block_size", "seq_bound", "level"))
