"""Batched TPU archive encoder: three device dispatches per archive.

The per-frame pipeline in ``tpu_codec`` issues device calls per block —
fine on local hardware, latency-bound through a remote device. This module
restructures compression to the archive level:

  dispatch 1: vmapped parse + per-block statistics (histograms, counts,
              boundary-adjusted literal lengths) for ALL frames
  host:       entropy table construction from the pulled histograms
              (~100 KB), literal/sequence mode decisions by exact bit-cost
  dispatch 2: vmapped FSE sequence bitstreams for ALL blocks
  dispatch 3: vmapped 4-stream Huffman literals for ALL blocks
  host:       byte assembly (headers, trees, concatenation), seek table

The big arrays (sequences, literal streams) never leave the device; only
histograms, counts, and the packed output words are pulled.
"""

from __future__ import annotations

import numpy as np

from .codec import frame as frame_mod
from .codec import huffman as huf
from .codec import literals as lit_mod
from .codec import sequences as seq_mod
from .codec.seq_encode import _choose_table, write_num_sequences
from .constants import ZSTD_BLOCK_SIZE_MAX
from .jax_setup import phase_timer
from .seek_table import SeekTable
from .xxhash64 import XXH64

import os as _os

# The archive encoder cuts blocks well below the 128 KiB format maximum:
# each block is an independent FSE stream (and 4 Huffman streams), so
# smaller blocks directly widen the device's parallel batch and shorten
# the sequential state chains. ~0.3% size cost on text at 32 KiB.
BLOCK_SIZE = int(_os.environ.get("ZEEKSTD_TPU_BLOCK", 32 << 10))

# Doubling depth of the primary sequence-execution program. Measured on
# dickens-like text: archives from OUR encoder (match cap 32/strips)
# resolve in 7 passes, native/libzstd archives (longer matches, deeper
# nesting) in 9-10. 8 covers every own-archive frame with margin — the
# decode path the batched pipeline actually serves — and each pass is a
# full-size gather (~5-10ms per 1M positions), so depth is runtime.
# Deeper nesting escalates to the 12-pass program, then host fallback.
FAST_DOUBLINGS = 8
assert BLOCK_SIZE <= ZSTD_BLOCK_SIZE_MAX

_fns = {}


def _jx():
    from .jax_setup import ensure_cache

    ensure_cache()
    import jax
    import jax.numpy as jnp

    return jax, jnp


def _stats_tail_one_frame(seq_bound: int, blocks_per_frame: int):
    """Per-frame code derivation + per-block statistics from a frame's raw
    parse triples (any parse front end: the XLA parse or the serial match
    kernel). Expects TRUE (cross-block) literal runs; clamps the first ll
    of each block itself (adj_ll)."""
    jax, jnp = _jx()

    from .codec.sequences import LL_BASE, ML_BASE
    from .ops.match_tpu import rep1_offset_values

    ll_base = jnp.asarray(LL_BASE.astype(np.int32))
    ml_base = jnp.asarray(ML_BASE.astype(np.int32))
    B = blocks_per_frame

    def tail(lls, mls, offs, n_seq, lits, n_lit, n_raw, n_valid):
        sidx = jnp.arange(seq_bound, dtype=jnp.int32)
        valid = sidx < n_seq
        out_len = lls + mls
        starts = jnp.cumsum(out_len) - out_len
        mstarts = starts + lls
        blk = jnp.clip(mstarts // BLOCK_SIZE, 0, B - 1)
        bstart = blk * BLOCK_SIZE
        adj_ll = mstarts - jnp.maximum(starts, bstart)
        # Same-block rep1 coding over the WRITTEN (block-clamped) lls.
        ovs = rep1_offset_values(
            lls, adj_ll, mls, offs, n_seq, BLOCK_SIZE, seq_bound
        )
        of_codes = 31 - jax.lax.clz(jnp.maximum(ovs, 1))
        ll_codes = jnp.where(
            adj_ll < 16,
            adj_ll,
            jnp.searchsorted(ll_base, adj_ll, side="right").astype(jnp.int32) - 1,
        )
        ml_codes = jnp.where(
            mls < 35,
            jnp.maximum(mls - 3, 0),
            jnp.searchsorted(ml_base, mls, side="right").astype(jnp.int32) - 1,
        )

        tgt = jnp.where(valid, blk, B)
        one = valid.astype(jnp.int32)
        seq_cnt = jnp.zeros(B, jnp.int32).at[tgt].add(one, mode="drop")
        first_idx = jnp.full(B, seq_bound, jnp.int32).at[tgt].min(
            jnp.where(valid, sidx, seq_bound), mode="drop"
        )
        ml_sum = jnp.zeros(B, jnp.int32).at[tgt].add(
            jnp.where(valid, mls, 0), mode="drop"
        )
        ll_hist = jnp.zeros(B * 36, jnp.int32).at[
            jnp.where(valid, blk * 36 + ll_codes, B * 36)
        ].add(one, mode="drop")
        ml_hist = jnp.zeros(B * 53, jnp.int32).at[
            jnp.where(valid, blk * 53 + ml_codes, B * 53)
        ].add(one, mode="drop")
        of_hist = jnp.zeros(B * 32, jnp.int32).at[
            jnp.where(valid, blk * 32 + of_codes, B * 32)
        ].add(one, mode="drop")

        # Literal-to-block assignment: block b holds litcnt_b = block_len_b -
        # ml_sum_b literal bytes, in stream order.
        bi = jnp.arange(B, dtype=jnp.int32)
        block_len = jnp.clip(n_valid - bi * BLOCK_SIZE, 0, BLOCK_SIZE)
        litcnt = block_len - ml_sum
        litcum = jnp.cumsum(litcnt)
        lidx = jnp.arange(lits.shape[0], dtype=jnp.int32)
        lit_blk = jnp.searchsorted(litcum, lidx, side="right").astype(jnp.int32)
        lit_valid = lidx < n_lit
        lit_hist = jnp.zeros(B * 256, jnp.int32).at[
            jnp.where(
                lit_valid,
                jnp.clip(lit_blk, 0, B - 1) * 256 + lits.astype(jnp.int32),
                B * 256,
            )
        ].add(lit_valid.astype(jnp.int32), mode="drop")

        # Tail padding so FSE-job dynamic slices (first : first + SB) never
        # clamp: a clamped slice used to demote the block to RAW
        # (slice_shift), silently costing ratio whenever a block's
        # sequence count crossed a power of two.
        pad = lambda a: jnp.pad(a, (0, seq_bound))
        return (
            pad(adj_ll), pad(mls), pad(ovs),
            pad(ll_codes), pad(ml_codes), pad(of_codes), lits,
            n_seq, n_lit, n_raw,
            seq_cnt, first_idx, ml_sum, litcnt,
            ll_hist.reshape(B, 36), ml_hist.reshape(B, 53),
            of_hist.reshape(B, 32), lit_hist.reshape(B, 256),
        )

    return tail


def _parse_stats_one_frame(frame_size: int, seq_bound: int, blocks_per_frame: int, level: int = 3,
                           prefix_len: int = 0):
    """Pure per-frame parse+stats function — the unit both the single-chip
    path (jit∘vmap) and the mesh pipeline (jit∘shard_map∘vmap) build on.
    With ``prefix_len`` (block-aligned) the input rows are prefix‖frame and
    sequences may reference the prefix region (patch mode)."""
    from .ops.match_tpu import parse_frame

    tail = _stats_tail_one_frame(seq_bound, blocks_per_frame)

    def one_frame(data_u8, n_valid):
        lls, mls, offs, n_seq, lits, n_lit, n_raw = parse_frame(
            data_u8, BLOCK_SIZE, seq_bound,
            n_valid=prefix_len + n_valid, level=level, start=prefix_len,
        )
        return tail(lls, mls, offs, n_seq, lits, n_lit, n_raw, n_valid)

    return one_frame


def _parse_stats_packed_fn(frame_size: int, seq_bound: int, B: int, level: int = 3,
                           prefix_len: int = 0):
    """jit(vmap(one_frame)) with the small per-frame statistics packed into
    ONE int32 row per frame — a single host pull instead of nine (each
    device->host transfer on this link costs tens of ms of latency)."""
    jax, jnp = _jx()
    key = ("parse_stats_packed", frame_size, seq_bound, B, level, prefix_len)
    if key in _fns:
        return _fns[key]
    one_frame = _parse_stats_one_frame(frame_size, seq_bound, B, level, prefix_len)

    def packed(data_u8, n_valid):
        (adj_ll, mls, ovs, llc, mlc, ofc, lits,
         n_seq, n_lit, n_raw, seq_cnt, first_idx, ml_sum, litcnt,
         ll_h, ml_h, of_h, lit_h) = one_frame(data_u8, n_valid)
        stats = jnp.concatenate([
            jnp.stack([n_seq, n_lit, n_raw]),
            seq_cnt, first_idx, ml_sum, litcnt,
            ll_h.reshape(-1), ml_h.reshape(-1),
            of_h.reshape(-1), lit_h.reshape(-1),
        ])
        return adj_ll, mls, ovs, llc, mlc, ofc, lits, stats

    _fns[key] = jax.jit(jax.vmap(packed))
    return _fns[key]


def _match_stats_packed_fn(frame_size: int, seq_bound: int, B: int, F: int):
    """Packed parse+stats built on the serial Pallas match kernel
    (ops/match_kernel.py) instead of the XLA sort/gather parse. Same
    output contract as ``_parse_stats_packed_fn`` (level-1 fast path),
    except the per-frame literal array is BLOCK-STRIDED: block b's
    literal bytes live at [b*BLOCK_SIZE, b*BLOCK_SIZE + litcnt_b) of the
    frame row (the downstream consumers only ever address literals
    block-contiguously through ``lit_lo``, so no cross-block compaction
    gather is needed), and the stats row carries B extra ``extrep``
    columns (blocks whose rep codes read history inherited from earlier
    blocks — the raw-demotion cascade input for ``_plan_block``).

    The kernel already emits block-clamped literal lengths, repeat-coded
    offset values and the four per-block histograms, so the shared stats
    tail is bypassed entirely; only the code columns for the FSE encoder
    are recomputed here (vector searchsorted, identical formulas)."""
    jax, jnp = _jx()
    key = ("match_stats_packed", frame_size, seq_bound, B, F)
    if key in _fns:
        return _fns[key]
    from .ops import fse_kernel as fk
    from .ops import match_kernel as mk

    SBd = BLOCK_SIZE // 4  # max sequences per block (every hit advances >= 4)
    NRECP = mk.bucket_nrecp(F * B)
    kern = mk.get_match_kernel(
        BLOCK_SIZE, SBd, NRECP,
        interpret=jax.default_backend() != "tpu",
    )
    BLKW = BLOCK_SIZE // 4
    consts_np = fk.make_consts()

    def packed(data_u8, n_valid, meta):
        # Little-endian words: the kernel's SMEM window + hash reads.
        # Padded to the NRECP bucket so the kernel shape is input-size
        # independent (one Mosaic compile per bucket).
        w = data_u8.reshape(-1, 4).astype(jnp.int32)
        words = w[:, 0] | (w[:, 1] << 8) | (w[:, 2] << 16) | (w[:, 3] << 24)
        words = jnp.pad(words, (0, NRECP * BLKW - words.shape[0]))
        lm, ofv, litw, stat = kern(jnp.asarray(consts_np), meta, words)

        statf = stat[: F * B].reshape(F, B, 512)
        nseq_b = statf[:, :, mk.ST_NSEQ]
        mlsum_b = statf[:, :, mk.ST_MLSUM]
        litcnt_b = statf[:, :, mk.ST_LITCNT]
        extrep_b = statf[:, :, mk.ST_EXTREP]
        ovf_b = statf[:, :, mk.ST_OVERFLOW]
        ll_h = statf[:, :, mk.ST_LLHIST : mk.ST_LLHIST + 36]
        ml_h = statf[:, :, mk.ST_MLHIST : mk.ST_MLHIST + 53]
        of_h = statf[:, :, mk.ST_OFHIST : mk.ST_OFHIST + 32]
        lit_h = statf[:, :, mk.ST_LITHIST : mk.ST_LITHIST + 256]

        n_seq = jnp.sum(nseq_b, axis=1)
        first = jnp.cumsum(nseq_b, axis=1) - nseq_b  # exclusive starts
        n_lit = jnp.sum(litcnt_b, axis=1)
        over = (n_seq > seq_bound) | (jnp.sum(ovf_b, axis=1) > 0)
        n_raw = jnp.where(over, seq_bound + 1, n_seq)

        # Block-strided literal rows: pure byte unpack, zero gathers.
        lw = litw[: F * B].reshape(F, B * BLKW, 1)
        lits = (
            (lw >> jnp.asarray([0, 8, 16, 24], jnp.int32)) & 0xFF
        ).astype(jnp.uint8).reshape(F, frame_size)

        first_idx = jnp.where(nseq_b > 0, first, seq_bound)
        stats = jnp.concatenate([
            jnp.stack([n_seq, n_lit, n_raw], axis=1),
            nseq_b, first_idx, mlsum_b, litcnt_b,
            ll_h.reshape(F, -1), ml_h.reshape(F, -1),
            of_h.reshape(F, -1), lit_h.reshape(F, -1),
            extrep_b,
        ], axis=1)
        # The flat per-frame sequence arrays existed only for the XLA FSE
        # producer; the serial FSE kernel reads the per-block lm/ofv rows
        # directly, and the code histograms now come from the match
        # kernel's post-loop pass — return dummies so XLA never builds
        # the 2*seq_bound gathers in kernel mode.
        dummy = jnp.zeros((F, 1), jnp.int32)
        return (
            dummy, dummy, dummy, dummy, dummy, dummy, lits, stats,
            lm.reshape(-1), ofv.reshape(-1),
        )

    _fns[key] = jax.jit(packed)
    return _fns[key]


def _unpack_stats(stats_np, B):
    """Host twin of the packing in ``_parse_stats_packed_fn``."""
    o = 0

    def take(k, shape=None):
        nonlocal o
        v = stats_np[:, o : o + k]
        o += k
        return v if shape is None else v.reshape((stats_np.shape[0],) + shape)

    head = take(3)
    out = {
        "n_seq": head[:, 0], "n_lit": head[:, 1], "n_raw": head[:, 2],
        "seq_cnt": take(B), "first_idx": take(B), "ml_sum": take(B),
        "litcnt": take(B),
        "ll_hist": take(B * 36, (B, 36)), "ml_hist": take(B * 53, (B, 53)),
        "of_hist": take(B * 32, (B, 32)), "lit_hist": take(B * 256, (B, 256)),
    }
    if o < stats_np.shape[1]:
        # Match-kernel rows append per-block extrep flags (rep history
        # inherited across blocks — the raw-demotion cascade input).
        out["extrep"] = take(B)
    return out


def _parse_stats_fn(frame_size: int, seq_bound: int, blocks_per_frame: int):
    jax, jnp = _jx()
    key = ("parse_stats", frame_size, seq_bound, blocks_per_frame)
    if key in _fns:
        return _fns[key]
    one_frame = _parse_stats_one_frame(frame_size, seq_bound, blocks_per_frame)
    _fns[key] = jax.jit(jax.vmap(one_frame))
    return _fns[key]


def _fse_one_block(SB: int, word_bound: int):
    """Pure one-block FSE encode (slices the frame's sequence arrays at the
    block's first index, then runs the interleaved three-state encoder)."""
    jax, jnp = _jx()
    from .codec.sequences import LL_BASE, LL_BITS, ML_BASE, ML_BITS
    from .ops.entropy import fse_encode_sequences

    ll_base = jnp.asarray(LL_BASE.astype(np.int32))
    ll_bits = jnp.asarray(LL_BITS.astype(np.int32))
    ml_base = jnp.asarray(ML_BASE.astype(np.int32))
    ml_bits = jnp.asarray(ML_BITS.astype(np.int32))

    def one_block(
        lls_f, mls_f, ovs_f, llc_f, mlc_f, ofc_f,  # frame arrays (seq_bound,)
        first, nseq,
        ll_dn, ll_df, ll_st, ml_dn, ml_df, ml_st, of_dn, of_df, of_st,
        ll_log, ml_log, of_log,
    ):
        sl = lambda a: jax.lax.dynamic_slice(a, (first,), (SB,))
        lls, mls, ovs = sl(lls_f), sl(mls_f), sl(ovs_f)
        llc, mlc, ofc = sl(llc_f), sl(mlc_f), sl(ofc_f)
        lle = lls - ll_base[llc]
        llb = ll_bits[llc]
        mle = mls - ml_base[mlc]
        mlb = ml_bits[mlc]
        ofe = ovs - (jnp.int32(1) << ofc)
        return fse_encode_sequences(
            llc, mlc, ofc, lle, mle, ofe, llb, mlb, ofc, nseq,
            ll_dn, ll_df, ll_st, ml_dn, ml_df, ml_st, of_dn, of_df, of_st,
            ll_log, ml_log, of_log, word_bound=word_bound,
        )

    return one_block


def _fse_blocks_fn(SB: int, word_bound: int):
    jax, jnp = _jx()
    key = ("fse_blocks", SB, word_bound)
    if key in _fns:
        return _fns[key]
    one_block = _fse_one_block(SB, word_bound)
    _fns[key] = jax.jit(
        jax.vmap(one_block, in_axes=(0,) * 6 + (0, 0) + (0,) * 9 + (0, 0, 0))
    )
    return _fns[key]


def _huf_one_stream(seg_bound: int, word_bound: int):
    """Pure one-stream Huffman encode over a slice of the frame's literal
    stream."""
    jax, jnp = _jx()
    from .ops.entropy import huffman_encode_stream

    def one_stream(lits_f, start, n, codes, nb):
        seg = jax.lax.dynamic_slice(lits_f, (start,), (seg_bound,))
        return huffman_encode_stream(seg, n, codes, nb, word_bound)

    return one_stream


def _huf_blocks_fn(seg_bound: int, word_bound: int):
    jax, jnp = _jx()
    key = ("huf_blocks", seg_bound, word_bound)
    if key in _fns:
        return _fns[key]
    _fns[key] = jax.jit(jax.vmap(_huf_one_stream(seg_bound, word_bound)))
    return _fns[key]


def _entropy_fn(SBd, WBo, NRECJ, seg_bound, hword_bound, lits_shape):
    """ONE jitted program for both entropy dispatches of the kernel
    encode path: the serial Pallas FSE encoder and the vmapped Huffman
    stream encoder. Merging them halves the dispatch fences of the
    entropy stage and drops one executable from the warmup set."""
    key = ("entropy", SBd, WBo, NRECJ, seg_bound, hword_bound, lits_shape)
    if key in _fns:
        return _fns[key]
    jax, jnp = _jx()
    from .ops import fse_kernel as fk

    kern = fk.get_fse_kernel(
        SBd, WBo, NRECJ, interpret=jax.default_backend() != "tpu"
    )
    huf_one = _huf_one_stream(seg_bound, hword_bound)
    consts = np.asarray(fk.make_consts())

    def fn(meta_j, lm_flat, ofv_flat, pool,
           lits_d, hfidx, hstarts, hns, hcodes, hnbs):
        fse_words, fse_bits = kern(
            jnp.asarray(consts), meta_j, lm_flat, ofv_flat, pool
        )
        huf_words, huf_bits = jax.vmap(huf_one)(
            lits_d[hfidx], hstarts, hns, hcodes, hnbs
        )
        return fse_words, fse_bits, huf_words, huf_bits

    _fns[key] = jax.jit(fn)
    return _fns[key]


def _loader_huf_table(hist):
    """Native Huffman tree/table build (ctypes) — the Python
    package-merge + FSE weight writer were ~70% of host_decisions."""
    try:
        from .native import loader

        return loader.huf_table(hist)
    except Exception:
        return None


def _host_jobs(
    F, lengths, overflow, seq_cnt, first_idx, litcnt,
    ll_hist, ml_hist, of_hist, lit_hist,
    lit_stride=None, extrep=None,
):
    """Per-block host decisions from the pulled device stats: block
    descriptors, Huffman literal jobs (with trees/tables), and FSE sequence
    jobs (with chosen symbol tables). Shared by the single-chip and the
    mesh-sharded pipelines (frame indices are local to the given stats).

    ``lit_stride``: block-strided literal rows (the match-kernel layout —
    block b's literals start at b*lit_stride) instead of compacted streams.
    ``extrep``: per-block flags marking rep codes that read history
    inherited from earlier blocks (drives _plan_block's demotion cascade).
    """
    blocks = []  # descriptors for device-encoded blocks
    for f in range(F):
        if overflow[f]:
            continue
        n_blocks_f = -(-int(lengths[f]) // BLOCK_SIZE)
        lit_lo = 0
        for b in range(n_blocks_f):
            b_len = min(BLOCK_SIZE, int(lengths[f]) - b * BLOCK_SIZE)
            if lit_stride is not None:
                lit_lo = b * lit_stride
            desc = {
                "frame": f, "block": b, "len": b_len,
                "nseq": int(seq_cnt[f, b]), "first": int(first_idx[f, b]),
                "lit_lo": lit_lo, "nlit": int(litcnt[f, b]),
            }
            if extrep is not None and extrep[f, b]:
                desc["ext_rep"] = True
            lit_lo += int(litcnt[f, b])
            blocks.append(desc)

    # Literal mode decisions + Huffman tables (host, from histograms).
    # Blocks reuse the previous block's tree (Treeless_Literals_Block,
    # RFC 8878 §3.1.1.1) when its code lengths price the new histogram no
    # worse than a fresh tree + its serialized weights — that skips both
    # the package-merge build (the hottest host loop here) and the tree
    # bytes in the output. tree_id tracks which emitted tree a treeless
    # block depends on so _plan_block can demote safely.
    huf_jobs = []  # stream-level jobs for the Huffman dispatch
    prev_tree = {}  # frame -> (tree_id, nb int64[256], codes256, nb256)
    tree_ids = iter(range(1, 1 << 30))
    for d in blocks:
        f, b = d["frame"], d["block"]
        hist = lit_hist[f, b].astype(np.int64)
        nlit = d["nlit"]
        d["lit_mode"] = "raw"
        nz = np.nonzero(hist)[0]
        if nlit == 0:
            continue
        if len(nz) == 1:
            d["lit_mode"] = "rle"
            d["rle_byte"] = int(nz[0])
            continue
        if nlit < 64 or d["nseq"] == 0:
            continue

        est_reuse = None
        prev = prev_tree.get(f)
        if prev is not None and np.all(prev[1][nz] > 0):
            reuse_bits = int(np.dot(hist[nz], prev[1][nz]))
            est_reuse = 6 + (reuse_bits + 7) // 8 + 4 + 5

        tree = codes256n = nb256n = None
        est_new = None
        native_ht = _loader_huf_table(hist)
        if native_ht is not None:
            tree, codes256n, nbu8 = native_ht
            nb256n = nbu8.astype(np.int32)
            stream_bits = int(np.dot(hist, nb256n.astype(np.int64)))
            est_new = len(tree) + 6 + (stream_bits + 7) // 8 + 4 + 5
        else:
            try:
                freqs = {int(s): int(hist[s]) for s in nz}
                lengths_map = huf.package_merge_lengths(freqs)
                weights = huf.lengths_to_weights(lengths_map, int(nz.max()))
                tree = huf.write_weights(weights)
                codes, nb, _ = huf.build_encode_table(weights)
                codes256n = np.zeros(256, np.uint32)
                codes256n[: len(codes)] = codes
                nb256n = np.zeros(256, np.int32)
                nb256n[: len(nb)] = nb
                stream_bits = int(
                    np.dot(hist[: len(nb)], np.asarray(nb, np.int64))
                )
                est_new = len(tree) + 6 + (stream_bits + 7) // 8 + 4 + 5
            except Exception:
                pass

        if est_reuse is not None and (est_new is None or est_reuse <= est_new):
            if est_reuse >= nlit:
                continue
            d["lit_mode"] = "huf"
            d["treeless"] = True
            d["tree"] = b""
            d["tree_id"] = prev[0]
            codes256, nb256 = prev[2], prev[3]
            est = est_reuse
        elif est_new is not None and est_new < nlit:
            d["lit_mode"] = "huf"
            d["tree"] = tree
            d["tree_id"] = next(tree_ids)
            codes256 = codes256n
            nb256 = nb256n
            prev_tree[f] = (
                d["tree_id"], nb256n.astype(np.int64), codes256, nb256,
            )
        else:
            continue
        seg = (nlit + 3) // 4
        segs = [seg, seg, seg, nlit - 3 * seg]
        d["huf_streams"] = []
        off = 0
        for sl in segs:
            d["huf_streams"].append(len(huf_jobs))
            huf_jobs.append((f, d["lit_lo"] + off, sl, codes256, nb256))
            off += sl

    # Sequence table choices from code histograms. Passing the previous
    # block's chosen table enables Repeat_Mode (no description bytes, no
    # table rebuild); tbl_id/dep_tbl_id let _plan_block verify the emitted
    # chain before honoring a repeat.
    fse_jobs = []
    prev_cat = {}  # (frame, cat) -> (tbl_id, enc_table)
    cat_ids = iter(range(1, 1 << 30))
    for d in blocks:
        if d["nseq"] == 0:
            continue
        f, b = d["frame"], d["block"]
        choices = {}
        d["tbl_id"] = {}
        d["dep_tbl_id"] = {}
        for cat, hist, defaults in (
            ("ll", ll_hist[f, b], (seq_mod.LL_DEFAULT_NORM, seq_mod.LL_DEFAULT_LOG, 35, 9)),
            ("of", of_hist[f, b], (seq_mod.OF_DEFAULT_NORM, seq_mod.OF_DEFAULT_LOG, 31, 8)),
            ("ml", ml_hist[f, b], (seq_mod.ML_DEFAULT_NORM, seq_mod.ML_DEFAULT_LOG, 52, 9)),
        ):
            prev = prev_cat.get((f, cat))
            choice = _choose_table(
                None, cat, *defaults[:2], defaults[2], defaults[3],
                prev_table=prev[1] if prev else None, hist=hist,
            )
            choices[cat] = choice
            if choice[0] == seq_mod.MODE_REPEAT:
                d["tbl_id"][cat] = prev[0]
                d["dep_tbl_id"][cat] = prev[0]
            else:
                tid = next(cat_ids)
                d["tbl_id"][cat] = tid
                prev_cat[(f, cat)] = (tid, choice[1])
        d["tables"] = choices
        d["fse_job"] = len(fse_jobs)
        fse_jobs.append(d)
    return blocks, huf_jobs, fse_jobs


def _fse_kernel_inputs(fse_jobs, B: int):
    """Stage the FSE job batch for the serial Pallas encoder
    (ops/fse_kernel.py): flat job meta + packed encode-table rows,
    deduped across Repeat_Mode blocks."""
    from .ops import fse_kernel as fk

    J = len(fse_jobs)
    NRECJ = fk.bucket_nrecj(J)
    meta = np.zeros((NRECJ, fk.JMETA_COLS), np.int32)
    rows = [np.zeros(1024, np.int32)]  # row 0: dummy for padded jobs
    row_of = {}

    def table_row(t):
        k = id(t)
        if k not in row_of:
            dnb = np.zeros(64, np.int32); dnb[: len(t.delta_nb_bits)] = t.delta_nb_bits
            dfs = np.zeros(64, np.int32); dfs[: len(t.delta_find_state)] = t.delta_find_state
            stt = np.asarray(t.state_table, np.int32)
            row_of[k] = len(rows)
            rows.append(fk.pack_enc_table(dnb, dfs, stt))
        return row_of[k]

    for j, d in enumerate(fse_jobs):
        meta[j, fk.J_REC] = d["frame"] * B + d["block"]
        meta[j, fk.J_NSEQ] = d["nseq"]
        meta[j, fk.J_TLL] = table_row(d["tables"]["ll"][1])
        meta[j, fk.J_TOF] = table_row(d["tables"]["of"][1])
        meta[j, fk.J_TML] = table_row(d["tables"]["ml"][1])
        meta[j, fk.J_LOGS] = (
            d["tables"]["ll"][1].accuracy_log
            | d["tables"]["of"][1].accuracy_log << 5
            | d["tables"]["ml"][1].accuracy_log << 10
        )
    Tp = 1 << max((len(rows) - 1).bit_length(), 1)
    pool = np.zeros((Tp, 1024), np.int32)
    pool[: len(rows)] = np.stack(rows)
    return meta, pool, NRECJ


def _fse_inputs(fse_jobs, seq_bound: int, SB: int | None = None, pad_to: int | None = None):
    """Stage the FSE job batch as numpy arrays (jobs on axis 0), padded by
    replicating job 0 to ``pad_to`` (or the next power of two). Returns
    (arrays dict, SB, word_bound). Sets each job's ``slice_shift``."""
    if SB is None:
        SB = 1 << max(max(d["nseq"] for d in fse_jobs) - 1, 1).bit_length()
        SB = min(SB, seq_bound)
    word_bound = (SB * 64) // 32 + 16
    NB = len(fse_jobs)
    NBp = pad_to if pad_to is not None else 1 << max((NB - 1).bit_length(), 3)

    def dense(t, size):
        dn = np.zeros(64, np.int32); dn[: len(t.delta_nb_bits)] = t.delta_nb_bits
        df = np.zeros(64, np.int32); df[: len(t.delta_find_state)] = t.delta_find_state
        stt = np.zeros(size, np.int32); stt[: len(t.state_table)] = t.state_table
        return dn, df, stt

    arrs = {k: [] for k in (
        "first", "nseq", "ll_dn", "ll_df", "ll_st", "ml_dn", "ml_df",
        "ml_st", "of_dn", "of_df", "of_st", "llog", "mlog", "olog", "fidx",
    )}
    # The stats tail pads the per-sequence frame arrays to 2*seq_bound, so
    # a slice starting at any valid ``first`` (< seq_bound) never clamps;
    # slice_shift stays as a guard for exotic bounds only.
    arr_len = 2 * seq_bound
    for d in fse_jobs:
        arrs["fidx"].append(d["frame"])
        arrs["first"].append(min(d["first"], arr_len - SB) if SB <= arr_len else 0)
        d["slice_shift"] = d["first"] - arrs["first"][-1]
        arrs["nseq"].append(d["nseq"])
        for cat, pre in (("ll", "ll"), ("ml", "ml"), ("of", "of")):
            t = d["tables"][cat][1]
            dn, df, stt = dense(t, 512 if cat != "of" else 256)
            arrs[pre + "_dn"].append(dn)
            arrs[pre + "_df"].append(df)
            arrs[pre + "_st"].append(stt)
        arrs["llog"].append(d["tables"]["ll"][1].accuracy_log)
        arrs["mlog"].append(d["tables"]["ml"][1].accuracy_log)
        arrs["olog"].append(d["tables"]["of"][1].accuracy_log)

    def padjobs(a, dtype=np.int32):
        a = np.asarray(a, dtype)
        return np.concatenate([a, np.repeat(a[:1], NBp - NB, axis=0)])

    out = {
        k: padjobs(np.stack(arrs[k]) if k.endswith(("_dn", "_df", "_st")) else arrs[k])
        for k in arrs
    }
    return out, SB, word_bound


def _huf_inputs(huf_jobs, seg_bound: int | None = None, pad_to: int | None = None):
    """Stage the Huffman job batch (padded like ``_fse_inputs``)."""
    if seg_bound is None:
        seg_bound = 1 << max(max(j[2] for j in huf_jobs) - 1, 1).bit_length()
    word_bound = (seg_bound * 12) // 32 + 8
    NJ = len(huf_jobs)
    NJp = pad_to if pad_to is not None else 1 << max((NJ - 1).bit_length(), 3)

    def padjobs(a, dtype=np.int32):
        a = np.asarray(a, dtype)
        return np.concatenate([a, np.repeat(a[:1], NJp - NJ, axis=0)])

    out = {
        "fidx": padjobs([j[0] for j in huf_jobs]),
        "starts": padjobs([j[1] for j in huf_jobs]),
        "ns": padjobs([j[2] for j in huf_jobs]),
        "codes": padjobs(np.stack([j[3] for j in huf_jobs]), np.uint32),
        "nbs": padjobs(np.stack([j[4] for j in huf_jobs])),
    }
    return out, seg_bound, word_bound


def _layout_archive(
    datas, blocks, overflow, fse_bits, huf_bits,
    fse_byte_shape, huf_byte_shape, lits_shape, frames_shape,
    checksum: bool,
    prefix_len: int = 0,
    window_cap: int | None = None,
):
    """Byte-exact archive layout (host): one SegmentPlan over the local
    frames ``datas`` (list of per-frame bytes). Returns (plan, d_sizes);
    callers pick the array form (``plan.build_runs`` ships KB-scale run
    segments and builds the dense map on device — the dense
    ``plan.build`` upload was the slowest encode stage at 4 B/output
    byte through this host->device link)."""
    from .ops.assemble import SegmentPlan

    F = len(datas)
    plan = SegmentPlan(F, fse_byte_shape, huf_byte_shape, lits_shape, frames_shape)
    d_sizes = []
    bi = 0
    for f in range(F):
        fdata = datas[f]
        flen = len(fdata)
        d_sizes.append(flen)
        if overflow[f]:
            from .codec.compress import compress_frame

            plan.add_static(f, compress_frame(fdata, level=1, checksum=checksum))
            while bi < len(blocks) and blocks[bi]["frame"] == f:
                bi += 1
            continue
        if flen == 0:
            from .codec.compress import compress_frame

            plan.add_static(f, compress_frame(b"", level=1, checksum=checksum))
            continue

        # Declared window: the match kernel's offsets are bounded by its
        # 512 KiB sliding window, so kernel-parsed frames declare the
        # tighter bound — smaller decoder allocations and ring-decoder
        # eligibility (ops/ring_kernel.py).
        window = flen + prefix_len
        if window_cap is not None:
            window = min(window, window_cap)
        plan.add_static(
            f, frame_mod.write_frame_header(flen, max(window, 1024), checksum)
        )
        n_blocks_f = -(-flen // BLOCK_SIZE)
        emit_state = {"tree_id": None, "fse_ids": {}}
        for b in range(n_blocks_f):
            d = blocks[bi]
            assert d["frame"] == f and d["block"] == b
            bi += 1
            last = b == n_blocks_f - 1
            _plan_block(plan, d, f, b, last, fdata, fse_bits, huf_bits,
                        emit_state, prefix_len)
        if checksum:
            h = XXH64(0)
            h.update(fdata)
            plan.add_static(f, (h.digest() & 0xFFFF_FFFF).to_bytes(4, "little"))
    return plan, d_sizes


class StagedInput:
    """Archive input staged on device once: reuse across repeated
    compressions (the benchmark discipline — input upload over the
    host->device link is reported separately from on-device compute)."""

    def __init__(self, data: bytes, frame_size: int):
        _, jnp = _jx()
        self.data = data
        self.frame_size = frame_size
        n = len(data)
        F = -(-n // frame_size)
        frames = np.zeros((F, frame_size), np.uint8)
        lengths = np.zeros(F, np.int32)
        for i in range(F):
            chunk = data[i * frame_size : (i + 1) * frame_size]
            frames[i, : len(chunk)] = np.frombuffer(chunk, np.uint8)
            lengths[i] = len(chunk)
        self.lengths = lengths
        with phase_timer("enc.input_stage") as _pt:
            self.frames_dev = jnp.asarray(frames)
            self.lengths_dev = jnp.asarray(lengths)
            _pt.fence(self.frames_dev)


def tpu_compress_archive(
    data,
    frame_size: int = 2 << 20,
    checksum: bool = False,
    return_device: bool = False,
    level: int = 3,
    prefix: bytes = b"",
    frame_spans=None,
):
    """Compress ``data`` (bytes, or a ``StagedInput`` already resident on
    device) into seekable frames with the batched device pipeline; returns
    (frames_blob, SeekTable).

    With ``return_device=True`` the final pull is skipped and
    (device_rows uint8[F, frame_bound], c_sizes, SeekTable) is returned —
    the on-device benchmark surface (compressed bytes stay in HBM).

    ``prefix`` enables patch mode: it is re-referenced at every frame
    start exactly like CCtx::ref_prefix (reference
    lib/src/encode.rs:332-338). The device parse requires block alignment,
    so only the LAST floor(len/BLOCK_SIZE) blocks of the prefix are
    searched — the nearest window, always sound (a decoder referencing
    the full prefix sees identical bytes at those offsets).

    ``frame_spans``: explicit per-frame (start, len) byte spans of
    ``data`` instead of uniform ``frame_size`` slicing — the
    compressed frame-size policy's second pass (reference analog:
    FrameSizePolicy::Compressed cuts, lib/src/encode.rs:537-544) cuts
    variable-length frames from pass-1 compressed-size prefix sums.
    """
    jax, jnp = _jx()

    staged = data if isinstance(data, StagedInput) else None
    if staged is not None:
        if staged.frame_size != frame_size:
            raise ValueError("StagedInput frame_size mismatch")
        data = staged.data
    plen = (len(prefix) // BLOCK_SIZE) * BLOCK_SIZE
    prefix_c = prefix[len(prefix) - plen :] if plen else b""
    if plen and staged is not None:
        raise ValueError("StagedInput cannot carry a prefix")
    if frame_spans is not None and (plen or staged is not None):
        raise ValueError("frame_spans cannot combine with prefix/StagedInput")
    n = len(data)
    if n == 0:
        from .codec.compress import compress_frame

        blob = compress_frame(b"", level=1, checksum=checksum)
        st = SeekTable()
        st.log_frame(len(blob), 0)
        return blob, st

    if frame_spans is not None:
        F = len(frame_spans)
        # Block-align the row width so the serial match kernel stays
        # eligible; per-frame valid lengths ride in ``lengths``.
        frame_size = -(-max(l for _s, l in frame_spans) // BLOCK_SIZE) * BLOCK_SIZE
    else:
        F = -(-n // frame_size)
    B = -(-frame_size // BLOCK_SIZE)
    seq_bound = min(1 << 18, max(2048, frame_size // 8))

    # Input rows cross the host->device link exactly ONCE (both the parse
    # and the assembler read them; a second jnp.asarray of the same numpy
    # array re-uploads the whole corpus — ~2s per 10 MiB on this tunnel).
    if frame_spans is not None:
        rows = np.zeros((F, frame_size), np.uint8)
        lengths = np.zeros(F, np.int32)
        for i, (s, l) in enumerate(frame_spans):
            rows[i, :l] = np.frombuffer(data[s : s + l], np.uint8)
            lengths[i] = l
        frames_dev = jnp.asarray(rows)
        lengths_dev = jnp.asarray(lengths)
        frames_shape = (F, frame_size)
    elif plen:
        # Patch mode: every frame row is prefix‖frame (the prefix is
        # re-referenced at each frame start, like the reference's
        # per-frame ref_prefix).
        rows = np.zeros((F, plen + frame_size), np.uint8)
        lengths = np.zeros(F, np.int32)
        pfx = np.frombuffer(prefix_c, np.uint8)
        for i in range(F):
            chunk = data[i * frame_size : (i + 1) * frame_size]
            rows[i, :plen] = pfx
            rows[i, plen : plen + len(chunk)] = np.frombuffer(chunk, np.uint8)
            lengths[i] = len(chunk)
        frames_dev = jnp.asarray(rows)
        lengths_dev = jnp.asarray(lengths)
        frames_shape = (F, plen + frame_size)
    else:
        if staged is None:
            staged = StagedInput(data, frame_size)
        frames_dev = staged.frames_dev
        lengths = staged.lengths
        lengths_dev = staged.lengths_dev
        frames_shape = (F, frame_size)

    # --- dispatch 1: parse + stats ---------------------------------------
    with phase_timer("enc.parse_dispatch") as _pt:
        # Level-1 fast path: the serial Pallas match kernel (v4: lazy
        # race + backward extension + stride-2 insertion) replaces the
        # XLA sort/gather parse. DEFAULT on real TPUs since round 4: it
        # measures BOTH better ratio (22.79% vs 22.86% on the 10 MiB
        # bench corpus; libzstd L1 23.60%) and faster parse (0.49s vs
        # 2.0s per 10 MiB). ZEEKSTD_TPU_MATCH=xla restores the XLA
        # parse; =kernel forces the kernel (incl. interpret mode on CPU,
        # which the round-trip tests use).
        match_mode = _os.environ.get("ZEEKSTD_TPU_MATCH", "")
        use_match_kernel = (
            level == 1
            and frame_size % BLOCK_SIZE == 0
            and frame_size <= (8 << 20)
            and F * frame_size < (1 << 31)
            and plen == 0
            and (
                match_mode == "kernel"
                or (match_mode != "xla" and jax.default_backend() == "tpu")
            )
        )
        lm_flat = ofv_flat = None
        if use_match_kernel:
            from .ops import match_kernel as _mk

            meta_mk = _mk.build_records(
                F, B, BLOCK_SIZE, frame_size, lengths,
                n_pad=_mk.bucket_nrecp(F * B),
            )
            parse = _match_stats_packed_fn(frame_size, seq_bound, B, F)
            (adj_ll, mls_d, ovs_d, llc_d, mlc_d, ofc_d, lits_d, stats_d,
             lm_flat, ofv_flat) = (
                parse(frames_dev, lengths_dev, jnp.asarray(meta_mk))
            )
        else:
            parse = _parse_stats_packed_fn(
                frame_size, seq_bound, B, level, prefix_len=plen
            )
            (adj_ll, mls_d, ovs_d, llc_d, mlc_d, ofc_d, lits_d, stats_d) = (
                parse(frames_dev, lengths_dev)
            )
        _pt.fence(stats_d)

    # Pull ONLY the small stats — one transfer for all of them.
    with phase_timer("enc.stats_pull"):
        stats = _unpack_stats(np.asarray(stats_d), B)
        n_seq = stats["n_seq"]
        n_raw = stats["n_raw"]
        seq_cnt = stats["seq_cnt"]
        first_idx = stats["first_idx"]
        litcnt = stats["litcnt"]
        ll_hist = stats["ll_hist"]
        ml_hist = stats["ml_hist"]
        of_hist = stats["of_hist"]
        lit_hist = stats["lit_hist"]

    # Frames whose parse overflowed fall back to the host encoder.
    overflow = n_raw > seq_bound

    # --- host: per-block decisions ---------------------------------------
    _t_host = phase_timer("enc.host_decisions").__enter__()
    blocks, huf_jobs, fse_jobs = _host_jobs(
        F, lengths, overflow, seq_cnt, first_idx, litcnt,
        ll_hist, ml_hist, of_hist, lit_hist,
        lit_stride=BLOCK_SIZE if use_match_kernel else None,
        extrep=stats.get("extrep"),
    )
    _t_host.__exit__()

    # --- dispatch 2: FSE blocks (words stay on device; only the per-job
    # bit counts — a few KB — are pulled, which lets the host lay out every
    # section byte-exactly for the device assembler) -----------------------
    _t_fse = phase_timer("enc.fse_dispatch").__enter__()
    fse_words = None
    fse_bits = None
    merged_huf = False
    if fse_jobs and lm_flat is not None:
        # Serial Pallas FSE encoder over the match kernel's per-block
        # rows (~40 scalar ops/sequence vs ~0.8 s/10 MiB of XLA scan).
        # The Huffman stream batch rides in the SAME jitted program when
        # present: one executable (warmup) and one dispatch fence
        # (per-run) instead of two.
        meta_j, pool, NRECJ = _fse_kernel_inputs(fse_jobs, B)
        SBd = BLOCK_SIZE // 4
        # pow2 word bound (SMEM tiling): >= SBd * 88 bits / 32
        WBo = 1 << (((SBd * 88) // 32 + 16) - 1).bit_length()
        if huf_jobs:
            hin, seg_bound, hword_bound = _huf_inputs(huf_jobs)
            fn = _entropy_fn(
                SBd, WBo, NRECJ, seg_bound, hword_bound,
                tuple(lits_d.shape),
            )
            fse_words, fse_bits, huf_words, huf_bits = fn(
                jnp.asarray(meta_j), lm_flat, ofv_flat, jnp.asarray(pool),
                lits_d, jnp.asarray(hin["fidx"]),
                jnp.asarray(hin["starts"]), jnp.asarray(hin["ns"]),
                jnp.asarray(hin["codes"]), jnp.asarray(hin["nbs"]),
            )
            merged_huf = True
        else:
            from .ops import fse_kernel as fk

            kern = fk.get_fse_kernel(
                SBd, WBo, NRECJ, interpret=jax.default_backend() != "tpu"
            )
            fse_words, fse_bits = kern(
                jnp.asarray(fk.make_consts()), jnp.asarray(meta_j),
                lm_flat, ofv_flat, jnp.asarray(pool),
            )
        _t_fse.fence(fse_words)
    elif fse_jobs:
        fin, SB, word_bound = _fse_inputs(fse_jobs, seq_bound)
        fidx = fin["fidx"]
        fn = _fse_blocks_fn(SB, word_bound)
        fse_words, fse_bits = fn(
            adj_ll[fidx], mls_d[fidx], ovs_d[fidx],
            llc_d[fidx], mlc_d[fidx], ofc_d[fidx],
            jnp.asarray(fin["first"]), jnp.asarray(fin["nseq"]),
            jnp.asarray(fin["ll_dn"]), jnp.asarray(fin["ll_df"]), jnp.asarray(fin["ll_st"]),
            jnp.asarray(fin["ml_dn"]), jnp.asarray(fin["ml_df"]), jnp.asarray(fin["ml_st"]),
            jnp.asarray(fin["of_dn"]), jnp.asarray(fin["of_df"]), jnp.asarray(fin["of_st"]),
            jnp.asarray(fin["llog"]), jnp.asarray(fin["mlog"]), jnp.asarray(fin["olog"]),
        )
        _t_fse.fence(fse_words)
    _t_fse.__exit__()

    # --- dispatch 3: Huffman streams (words stay on device; merged into
    # dispatch 2 on the kernel path) ---------------------------------------
    _t_huf = phase_timer("enc.huf_dispatch").__enter__()
    if not merged_huf:
        huf_words = None
        huf_bits = None
        if huf_jobs:
            hin, seg_bound, word_bound = _huf_inputs(huf_jobs)
            fn = _huf_blocks_fn(seg_bound, word_bound)
            huf_words, huf_bits = fn(
                lits_d[hin["fidx"]], jnp.asarray(hin["starts"]), jnp.asarray(hin["ns"]),
                jnp.asarray(hin["codes"]), jnp.asarray(hin["nbs"]),
            )
            _t_huf.fence(huf_words)
    _t_huf.__exit__()

    # One round trip for both small bit-count arrays (each separate pull on
    # this link pays tens of ms of latency).
    with phase_timer("enc.bits_pull"):
        pulls = [a for a in (fse_bits, huf_bits) if a is not None]
        if pulls:
            got = iter(jax.device_get(pulls))
            if fse_bits is not None:
                fse_bits = next(got)
            if huf_bits is not None:
                huf_bits = next(got)

    # --- host assembly ----------------------------------------------------
    _t_asm = phase_timer("enc.plan_layout").__enter__()
    dummy_w = jnp.zeros((1, 4), jnp.uint32)
    if fse_words is None:
        fse_words, fse_bits = dummy_w, np.zeros(1, np.int32)
    if huf_words is None:
        huf_words, huf_bits = dummy_w, np.zeros(1, np.int32)

    if frame_spans is not None:
        datas = [data[s : s + l] for s, l in frame_spans]
    else:
        datas = [
            data[f * frame_size : f * frame_size + int(lengths[f])]
            for f in range(F)
        ]
    plan, d_sizes = _layout_archive(
        datas, blocks, overflow, fse_bits, huf_bits,
        (fse_words.shape[0], fse_words.shape[1] * 4),
        (huf_words.shape[0], huf_words.shape[1] * 4),
        lits_d.shape, frames_shape, checksum, prefix_len=plen,
        window_cap=(1 << 19) if use_match_kernel else None,
    )
    seg_dest, seg_base, static_pool, c_sizes = plan.build_runs()
    frame_bound = 1 << max((int(c_sizes.max()) - 1).bit_length(), 7)
    _t_asm.__exit__()

    # --- dispatch 4: device byte assembly (index map built on device from
    # the run segments; the dense map never crosses the host->device link) --
    _t_dev = phase_timer("enc.assemble_dispatch").__enter__()
    fn = _assemble_jit(
        seg_dest.shape, frame_bound, static_pool.shape, fse_words.shape,
        huf_words.shape, lits_d.shape, frames_shape,
    )
    rows_dev = fn(
        jnp.asarray(seg_dest), jnp.asarray(seg_base),
        jnp.asarray(c_sizes.astype(np.int32)), jnp.asarray(static_pool),
        fse_words, jnp.asarray(np.asarray(fse_bits, np.int32)),
        huf_words, jnp.asarray(np.asarray(huf_bits, np.int32)),
        lits_d, frames_dev,
    )
    _t_dev.fence(rows_dev)
    _t_dev.__exit__()

    st = SeekTable()
    for f in range(F):
        st.log_frame(int(c_sizes[f]), d_sizes[f])
    if return_device:
        return rows_dev, c_sizes, st

    with phase_timer("enc.blob_pull"):
        rows = np.asarray(rows_dev)
        blob = b"".join(rows[f, : c_sizes[f]].tobytes() for f in range(F))
    return blob, st


def _assemble_jit(segs_shape, frame_bound, static_shape, fse_shape, huf_shape, lits_shape, frames_shape):
    key = ("assemble", segs_shape, frame_bound, static_shape, fse_shape, huf_shape, lits_shape, frames_shape)
    if key in _fns:
        return _fns[key]
    jax, jnp = _jx()
    from .ops.assemble import assemble_archive_runs, finalize_streams

    def fn(seg_dest, seg_base, c_sizes, static_pool, fse_w, fse_b, huf_w, huf_b, lits, frames):
        fse_bytes = finalize_streams(fse_w, fse_b)
        huf_bytes = finalize_streams(huf_w, huf_b)
        return assemble_archive_runs(
            seg_dest, seg_base, c_sizes, frame_bound,
            static_pool, fse_bytes, huf_bytes, lits, frames,
        )

    _fns[key] = jax.jit(fn)
    return _fns[key]


def _stream_len(bits: int) -> int:
    """Backward-stream byte length incl. sentinel (words_to_stream twin)."""
    return int(bits) // 8 + 1


def _plan_block(plan, d, f, b, last, fdata, fse_bits, huf_bits, emit_state=None,
                prefix_len: int = 0):
    """Lay out one block's output segments. Every section length is
    host-exact here (stream byte counts come from the pulled bit counts),
    so raw-vs-compressed is decided exactly like the host encoder.

    ``emit_state`` tracks which Huffman tree / FSE tables have actually
    been EMITTED so far in this frame: a treeless or Repeat_Mode block
    whose assumed predecessor was demoted to a raw block must demote too
    (its reference would otherwise dangle — silent corruption)."""
    if emit_state is None:
        emit_state = {"tree_id": None, "fse_ids": {}}
    blen = d["len"]
    raw_block_off = b * BLOCK_SIZE
    nlit = d["nlit"]

    # Rep-history cascade (match-kernel parses): once a sequence-bearing
    # block of this frame was demoted to raw, the decoder's repeat-offset
    # history diverges from what the parse assumed, so any later block
    # whose rep codes read INHERITED history (ext_rep) must demote too.
    rep_ok = not (d.get("ext_rep") and emit_state.get("rep_broken"))

    lit_plan = None  # (sec_len, emit) where emit appends segments
    body_len = None
    if d["nseq"] > 0 and d.get("slice_shift", 0) == 0 and rep_ok:
        # Literals section layout.
        mode = d["lit_mode"]
        treeless = bool(d.get("treeless"))
        if mode == "huf" and treeless and emit_state["tree_id"] != d["tree_id"]:
            mode = "raw"  # defining tree was demoted; reference would dangle
        if mode == "huf":
            parts = [_stream_len(huf_bits[sj]) for sj in d["huf_streams"]]
            if any(p > 0xFFFF for p in parts[:3]):
                mode = "raw"
            else:
                payload_len = len(d["tree"]) + 6 + sum(parts)
                try:
                    hdr = lit_mod.write_literals_header(
                        lit_mod.LIT_TREELESS if treeless else lit_mod.LIT_COMPRESSED,
                        nlit, payload_len, True,
                    )
                except Exception:
                    mode = "raw"
        if mode == "huf":
            jump = b"".join(p.to_bytes(2, "little") for p in parts[:3])
            sec_len = len(hdr) + payload_len

            def emit_lits(hdr=hdr, jump=jump, parts=parts):
                plan.add_static(f, hdr + d["tree"] + jump)
                for sj, p in zip(d["huf_streams"], parts):
                    plan.add_huf(f, sj, p)

        elif mode == "rle":
            hdr = lit_mod.write_literals_header(lit_mod.LIT_RLE, nlit, 0, False)
            sec_len = len(hdr) + 1

            def emit_lits(hdr=hdr):
                plan.add_static(f, hdr + bytes([d["rle_byte"]]))

        else:
            hdr = lit_mod.write_literals_header(lit_mod.LIT_RAW, nlit, 0, False)
            sec_len = len(hdr) + nlit

            def emit_lits(hdr=hdr):
                plan.add_static(f, hdr)
                plan.add_lits(f, f, d["lit_lo"], nlit)

        # Sequences section layout. A Repeat_Mode table is honored only
        # when the table it repeats is the one actually emitted so far.
        for cat in ("ll", "of", "ml"):
            dep = d.get("dep_tbl_id", {}).get(cat)
            if dep is not None and emit_state["fse_ids"].get(cat) != dep:
                body_len = None
                break
        else:
            seq_static = bytearray(write_num_sequences(d["nseq"]))
            ll_mode, of_mode, ml_mode = (
                d["tables"]["ll"][0], d["tables"]["of"][0], d["tables"]["ml"][0]
            )
            seq_static.append((ll_mode << 6) | (of_mode << 4) | (ml_mode << 2))
            seq_static += d["tables"]["ll"][2] + d["tables"]["of"][2] + d["tables"]["ml"][2]
            fse_len = _stream_len(fse_bits[d["fse_job"]])
            body_len = sec_len + len(seq_static) + fse_len

    if body_len is None or body_len >= blen:
        # Raw / RLE fallback block.
        if d["nseq"] > 0:
            emit_state["rep_broken"] = True
        first = fdata[raw_block_off : raw_block_off + 1]
        if blen > 0 and fdata.count(first, raw_block_off, raw_block_off + blen) == blen:
            plan.add_static(
                f,
                frame_mod.write_block_header(last, frame_mod.BLOCK_RLE, blen) + first,
            )
        else:
            plan.add_static(
                f, frame_mod.write_block_header(last, frame_mod.BLOCK_RAW, blen)
            )
            # With prefix staging the frame bytes start prefix_len into
            # the device row.
            plan.add_raw(f, f, prefix_len + raw_block_off, blen)
        return

    plan.add_static(
        f, frame_mod.write_block_header(last, frame_mod.BLOCK_COMPRESSED, body_len)
    )
    emit_lits()
    plan.add_static(f, bytes(seq_static))
    plan.add_fse(f, d["fse_job"], fse_len)
    # Record what this block actually emitted for downstream references
    # (``mode`` is the literal mode actually used, after any demotion).
    if mode == "huf" and not treeless and "tree_id" in d:
        emit_state["tree_id"] = d["tree_id"]
    for cat in ("ll", "of", "ml"):
        tid = d.get("tbl_id", {}).get(cat)
        if tid is not None:
            emit_state["fse_ids"][cat] = tid


def tpu_decompress_archive(
    blob: bytes,
    seek_table=None,
    verify_checksum: bool = True,
    return_device: bool = False,
):
    """Batched device decode of a whole seekable archive — the decode twin
    of ``tpu_compress_archive``.

    All frames' Huffman literal streams decode in ONE vmapped dispatch, all
    blocks' FSE sequence streams in a second; a third dispatch gathers the
    per-frame literal/sequence layouts (host-indexed, device-sourced) and
    executes every frame's sequences. Decoded data never visits the host
    mid-pipeline; with ``return_device=True`` even the final output stays
    in HBM and (device uint8[F, out_bound], sizes) is returned. With a
    ``seek_table`` the frame boundaries come from it (reference analog:
    decompress through the seek table, lib/src/decode.rs); without one the
    frames are walked sequentially, skipping skippable frames.
    """
    jax, jnp = _jx()
    from .tpu_codec import _plan_frame, _fix_rep_carry
    from .xxhash64 import XXH64
    from .errors import checksum_wrong, corruption_detected

    # --- host: plan every frame ------------------------------------------
    _t_plan = phase_timer("dec.plan").__enter__()
    plans = []  # (hdr, plan, checksum_pos)
    frame_starts = []  # blob offset of each planned frame (host fallbacks)
    if seek_table is not None:
        for i in range(seek_table.num_frames):
            start = seek_table.frame_start_comp(i)
            if seek_table.frame_size_decomp(i) == 0 and seek_table.frame_end_comp(i) == start:
                continue
            hdr_i, plan_i, fpos_i = _plan_frame(blob, start)
            # The frame must consume exactly its seek-table extent: a
            # corrupted header (e.g. a flipped checksum-flag bit) otherwise
            # shifts the trailer and decodes silently wrong.
            consumed = fpos_i + (4 if hdr_i.has_checksum else 0)
            if consumed != seek_table.frame_end_comp(i):
                raise corruption_detected(
                    f"frame {i} consumed {consumed - start} bytes; seek "
                    f"table records {seek_table.frame_size_comp(i)}"
                )
            plans.append((hdr_i, plan_i, fpos_i))
            frame_starts.append(start)
    else:
        pos = 0
        while pos < len(blob):
            magic = int.from_bytes(blob[pos : pos + 4], "little")
            if (magic & 0xFFFFFFF0) == 0x184D2A50:  # skippable (incl. seek table)
                size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
                pos += 8 + size
                continue
            hdr, plan, fpos = _plan_frame(blob, pos)
            plans.append((hdr, plan, fpos))
            frame_starts.append(pos)
            pos = fpos + (4 if hdr.has_checksum else 0)

    _t_plan.__exit__()

    if not plans:
        return b""

    stream_list = []
    for _, plan, _ in plans:
        for kind, *args in plan:
            if kind == "cmp" and "streams" in args[0]:
                stream_list.extend(args[0]["streams"])

    # Collect sequence-bearing blocks (row order shared by all exec paths).
    seq_blocks = []
    frame_rows = []  # per frame: list of batch-row indices
    for _, plan, _ in plans:
        rows = []
        for kind, *args in plan:
            if kind == "cmp" and args[0].get("nseq", 0) > 0:
                rows.append(len(seq_blocks))
                seq_blocks.append(args[0])
        frame_rows.append(rows)

    exec_mode = _os.environ.get("ZEEKSTD_TPU_EXEC", "")
    on_tpu = jax.default_backend() == "tpu"

    # Fused decoder kernel: FSE decode + sequence execution in ONE serial
    # kernel — the FSE batch dispatch is skipped entirely, repeat offsets
    # resolve in-order with exact libzstd semantics (no host rep-carry).
    if exec_mode == "fused" or (
        exec_mode not in ("serial", "doubling") and on_tpu
    ):
        with phase_timer("dec.huf_host"):
            dec_list = _huf_batch_host(stream_list)
        res = _fused_exec_dispatch(
            blob, plans, frame_rows, seq_blocks,
            dec_list, seek_table,
            verify_checksum, return_device,
        )
        if res is not NotImplemented:
            return res

    # --- device dispatch 1 (fallback paths): all Huffman streams ----------
    with phase_timer("dec.huf_batch") as _pt:
        dec_streams, huf_out_bound = _huf_batch_dev(stream_list)
        _pt.fence(dec_streams)

    # --- device dispatch 2: all FSE sequence streams (stay on device) -----
    with phase_timer("dec.fse_batch") as _pt2:
        (lls_b, mls_b, offs_b, ofvs_b, hasrep_dev,
         dec_seq_bound) = _fse_batch_dev(seq_blocks)
        _pt2.fence(lls_b)

    # Serial-executor fast path on pre-decoded rows (fused-guard fallback;
    # still avoids the host rep-carry pass and the doubling gathers).
    use_serial = exec_mode == "serial" or (
        exec_mode != "doubling" and on_tpu
    )
    if use_serial:
        res = _serial_exec_dispatch(
            blob, plans, frame_starts, frame_rows, seq_blocks,
            lls_b, mls_b, ofvs_b, dec_seq_bound,
            dec_streams, huf_out_bound, seek_table,
            verify_checksum, return_device,
        )
        if res is not NotImplemented:
            return res

    # Cross-block repeat-offset carry: only frames that use repeat codes
    # beyond their first block need the sequential host fix (our encoder
    # never emits repeat codes; this path serves foreign archives). Only
    # those frames' rows are pulled/pushed.
    with phase_timer("dec.rep_carry"):
        if seq_blocks:
            # Computed inside the FSE dispatch — one pull, no extra round
            # trip (_hasrep_fn remains for the sharded pipeline).
            hasrep = np.asarray(hasrep_dev)
            fix_rows = []
            for rows in frame_rows:
                if any(hasrep[r] for r in rows[1:]):
                    fix_rows.extend(rows)
            if fix_rows:
                rows_idx = np.asarray(fix_rows, np.int32)
                lls_f = np.array(lls_b[rows_idx])
                ofvs_f = np.array(ofvs_b[rows_idx])
                offs_f = np.array(offs_b[rows_idx])  # writable copies
                row_pos = {r: i for i, r in enumerate(fix_rows)}
                for rows in frame_rows:
                    if not rows or not any(hasrep[r] for r in rows[1:]):
                        continue
                    local = [row_pos[r] for r in rows]
                    _fix_rep_carry(
                        [seq_blocks[r] for r in rows], local, lls_f, ofvs_f, offs_f
                    )
                offs_b = offs_b.at[jnp.asarray(rows_idx)].set(jnp.asarray(offs_f))

    # --- host: index maps for device literal/triple assembly ---------------
    with phase_timer("dec.layout"):
        F = len(plans)
        NB = max(len(seq_blocks), 1)
        # virtual pool layout for the (ll, ml, off) triples:
        #   [0, NB*seq_bound)              decoded sequence slots
        #   [NB*seq_bound, +NB)            per-block trailing literal runs
        #   [NB*seq_bound+NB, +C)          host constant pseudo-sequences
        trail_base = NB * dec_seq_bound
        const_base = trail_base + NB
        consts = [(0, 0, 1)]  # padding slot
        static_lits = bytearray()
        lit_segs = [[] for _ in range(F)]  # (virt_off, len) into lit pool
        seq_slots = [[] for _ in range(F)]  # virtual triple indices
        chunk_lits = np.zeros(NB, np.int64)  # literal bytes per seq block
        totals = []
        si = 0
        for fi, (hdr, plan, _) in enumerate(plans):
            rows = list(frame_rows[fi])
            total = 0
            for kind, *args in plan:
                if kind == "raw":
                    data_b = args[0]
                    lit_segs[fi].append((len(static_lits), len(data_b), True))
                    static_lits += data_b
                    consts.append((len(data_b), 0, 1))
                    seq_slots[fi].append(const_base + len(consts) - 1)
                    total += len(data_b)
                elif kind == "rle":
                    byte, nrep = args[0], args[1]
                    lit_segs[fi].append((len(static_lits), 1, True))
                    static_lits.append(byte)
                    if nrep > 1:
                        consts.append((1, 0, 1))
                        seq_slots[fi].append(const_base + len(consts) - 1)
                        consts.append((0, nrep - 1, 1))
                        seq_slots[fi].append(const_base + len(consts) - 1)
                    else:
                        consts.append((1, 0, 1))
                        seq_slots[fi].append(const_base + len(consts) - 1)
                    total += nrep
                else:
                    d = args[0]
                    if "streams" in d:
                        chunk_len = 0
                        for sbytes, olen, _t in d["streams"]:
                            lit_segs[fi].append((si * huf_out_bound, olen, False))
                            si += 1
                            chunk_len += olen
                    else:
                        lb = d.get("lit_bytes", b"")
                        lit_segs[fi].append((len(static_lits), len(lb), True))
                        static_lits += lb
                        chunk_len = len(lb)
                    n = d.get("nseq", 0)
                    if n == 0:
                        consts.append((chunk_len, 0, 1))
                        seq_slots[fi].append(const_base + len(consts) - 1)
                        total += chunk_len
                    else:
                        r = rows.pop(0)
                        chunk_lits[r] = chunk_len
                        seq_slots[fi].extend(
                            range(r * dec_seq_bound, r * dec_seq_bound + n)
                        )
                        seq_slots[fi].append(trail_base + r)
            totals.append(total)

        # ``totals`` counts only literal-only plan entries; frames with real
        # sequences get their exact size from the frame header (always
        # present for our own frames) or, for foreign headerless frames,
        # from a small device reduction below.
        S = 1 << max((max(len(s) for s in seq_slots) - 1).bit_length(), 5)
        L = 1 << max(
            (max(sum(g[1] for g in lit_segs[fi]) for fi in range(F)) - 1).bit_length(),
            7,
        )
        sp = 1 << max((len(static_lits) - 1).bit_length() if static_lits else 0, 7)
        static_np = np.zeros(sp, np.uint8)
        static_np[: len(static_lits)] = np.frombuffer(bytes(static_lits), np.uint8)

        # The slot/literal index maps are run-structured (long consecutive
        # ranges); uploading them dense costs ~10MB per 10MiB archive on
        # this latency-heavy link. Ship per-frame segment triples
        # (dest, base, len) instead — the exec dispatch rebuilds the dense
        # maps on device with the scatter-add + cumsum segment-id pattern.
        def runs_of(indices):
            arr = np.asarray(indices, np.int64)
            if arr.size == 0:
                return np.zeros((0, 2), np.int64)
            brk = np.nonzero(np.diff(arr) != 1)[0] + 1
            starts = np.concatenate([[0], brk])
            return np.stack([starts, arr[starts]], axis=1)  # (dest, base)

        seq_runs = []
        for fi in range(F):
            r = runs_of(seq_slots[fi])
            seq_runs.append(r)
        SEGS = 1 << max(
            (max((len(r) for r in seq_runs), default=1) - 1).bit_length(), 2
        )
        seq_dest = np.full((F, SEGS), S, np.int32)  # S = dropped sentinel
        seq_base = np.full((F, SEGS), const_base, np.int32)
        nslots = np.zeros(F, np.int32)
        for fi in range(F):
            r = seq_runs[fi]
            seq_dest[fi, : len(r)] = r[:, 0]
            seq_base[fi, : len(r)] = r[:, 1]
            nslots[fi] = len(seq_slots[fi])

        SEGL = 1 << max(
            (max((len(lit_segs[fi]) for fi in range(F)), default=1) - 1).bit_length(),
            2,
        )
        lit_dest = np.full((F, SEGL), L, np.int32)
        lit_base = np.zeros((F, SEGL), np.int32)
        nlit_f = np.zeros(F, np.int32)
        for fi in range(F):
            off = 0
            for k, (src, ln, is_static) in enumerate(lit_segs[fi]):
                lit_dest[fi, k] = off
                lit_base[fi, k] = src if is_static else sp + src
                off += ln
            nlit_f[fi] = off
        consts_np = np.asarray(consts, np.int64)

        out_sizes = []
        from .constants import SEEKABLE_MAX_FRAME_SIZE

        for fi, (hdr, _p, _c) in enumerate(plans):
            if (
                hdr.content_size is not None
                and hdr.content_size > SEEKABLE_MAX_FRAME_SIZE
            ):
                # Corrupt/hostile header must not drive a giant allocation
                # (seekable frames are capped at 1 GiB, lib/src/lib.rs:53-58).
                raise corruption_detected("declared frame size exceeds cap")
            out_sizes.append(
                hdr.content_size if hdr.content_size is not None else -1
            )
        if any(sz < 0 for sz in out_sizes) and seq_blocks:
            # Headerless foreign frame: derive output sizes on device from
            # the decoded (ll, ml) slots before sizing the output buffer.
            tf = _dec_totals_fn((NB, dec_seq_bound), (F, S), consts_np.shape[0])
            tot_pre = np.asarray(
                tf(
                    lls_b, mls_b, jnp.asarray(
                        np.asarray([d["nseq"] for d in seq_blocks], np.int32)
                    ),
                    jnp.asarray(chunk_lits.astype(np.int32)),
                    jnp.asarray(consts_np[:, 0].astype(np.int32)),
                    jnp.asarray(consts_np[:, 1].astype(np.int32)),
                    jnp.asarray(map_seq),
                )
            )
            out_sizes = [
                sz if sz >= 0 else int(t) for sz, t in zip(out_sizes, tot_pre)
            ]
        out_bound = 1 << max(
            (max(max(out_sizes), max(totals or [0]), 1) - 1).bit_length(), 7
        )

    # --- device dispatch 3: assemble triples + execute ---------------------
    with phase_timer("dec.exec_dispatch") as _pt3:
        exec_shapes = (
            (NB, dec_seq_bound), dec_streams.shape, (F, S, SEGS), (F, L, SEGL),
            static_np.shape[0], consts_np.shape[0], out_bound,
        )
        nseq_dev = jnp.asarray(
            np.asarray([d["nseq"] for d in seq_blocks], np.int32)
            if seq_blocks else np.zeros(NB, np.int32)
        )
        exec_args = (
            lls_b, mls_b, offs_b, nseq_dev,
            jnp.asarray(chunk_lits.astype(np.int32)),
            jnp.asarray(consts_np[:, 0].astype(np.int32)),
            jnp.asarray(consts_np[:, 1].astype(np.int32)),
            jnp.asarray(consts_np[:, 2].astype(np.int32)),
            jnp.asarray(seq_dest), jnp.asarray(seq_base), jnp.asarray(nslots),
            jnp.asarray(lit_dest), jnp.asarray(lit_base), jnp.asarray(nlit_f),
            jnp.asarray(static_np), dec_streams,
        )
        # Shallow program first: every doubling pass is a full-size gather
        # (~5-10ms per 1M positions on this chip), and text rarely nests
        # match copies deeper than 2^FAST_DOUBLINGS segments.
        fn = _dec_exec_fn(*exec_shapes, n_doublings=FAST_DOUBLINGS)
        out_dev, totals_dev, bad_dev, conv_dev = fn(*exec_args)
        _pt3.fence(out_dev)

    conv_np = np.asarray(conv_dev)
    if not conv_np.all():
        # Deep copy-chain nesting: escalate to the full-depth program
        # (separate cached compile) before any host fallback.
        with phase_timer("dec.exec_deep"):
            fn = _dec_exec_fn(*exec_shapes, n_doublings=None)
            out_dev, totals_dev, bad_dev, conv_dev = fn(*exec_args)
            conv_np = np.asarray(conv_dev)

    if return_device:
        out_dev.block_until_ready()
        if not conv_np.all():
            # Copy chains deeper than 2^N_DOUBLINGS segments (pathological
            # nesting): the device rows are not trustworthy; callers that
            # need the bytes use the pulled path, which falls back per frame.
            raise RuntimeError(
                "sequence copy chains exceeded the pointer-doubling depth; "
                "re-run without return_device for the host fallback"
            )
        return out_dev, [
            sz if sz >= 0 else int(t)
            for sz, t in zip(out_sizes, np.asarray(totals_dev))
        ]

    # --- pull + verify -----------------------------------------------------
    with phase_timer("dec.pull+verify"):
        out = np.asarray(out_dev)
        totals_np = np.asarray(totals_dev)
        bad_np = np.asarray(bad_dev)
        parts = []
        for i, (hdr, plan, cpos) in enumerate(plans):
            if not conv_np[i]:
                # Pathologically deep copy-chain nesting: host decode.
                from .codec.decompress import decompress_frame

                result, _end = decompress_frame(blob, frame_starts[i])
                parts.append(result)
                continue
            if bad_np[i]:
                raise corruption_detected(
                    "match offset beyond window or literal overrun"
                )
            tot = int(totals_np[i])
            if hdr.content_size is not None and tot != hdr.content_size:
                raise corruption_detected("frame content size mismatch")
            result = out[i, :tot].tobytes()
            if hdr.has_checksum and verify_checksum:
                stored = int.from_bytes(blob[cpos : cpos + 4], "little")
                h = XXH64(0)
                h.update(result)
                if (h.digest() & 0xFFFF_FFFF) != stored:
                    raise checksum_wrong("content checksum mismatch")
            parts.append(result)
    return b"".join(parts)


def _hasrep_fn(shape):
    """Per-block flag: uses a repeat code whose resolution could depend on
    history from EARLIER blocks. Same-block rep1 (ofv==1, ll>0, not the
    block's first sequence) resolves exactly against the per-block fresh
    history, so only the other repeat forms force the sequential fix."""
    key = ("hasrep", shape)
    if key in _fns:
        return _fns[key]
    jax, jnp = _jx()

    def fn(ofvs, lls, nseq):
        k = jnp.arange(ofvs.shape[1], dtype=jnp.int32)[None, :]
        valid = k < nseq[:, None]
        safe = jnp.logical_and(
            jnp.logical_and(ofvs == 1, lls > 0), k >= 1
        )
        return jnp.any(
            jnp.logical_and(valid, jnp.logical_and(ofvs <= 3, ~safe)), axis=1
        )

    _fns[key] = jax.jit(fn)
    return _fns[key]


def _huf_batch_host(stream_list):
    """Host-side batch Huffman literal decode (native ctypes; Python
    codec fallback): returns list[np.uint8] in stream order. The whole
    pool is a few hundred KB — decoding it host-side (~us/stream) and
    uploading the assembled pool once beats the device bit-serial
    dispatch by ~0.2 s per 10 MiB on this link."""
    from .native import loader
    from .codec import huffman as huf

    native_ok = loader.available()
    out = []
    for sbytes, olen, table in stream_list:
        dec = None
        if native_ok and table.max_bits <= 11:
            dec = loader.huf_stream_decode(
                sbytes, table.symbol, table.nb_bits, table.max_bits, olen
            )
        if dec is None:
            dec = np.frombuffer(
                huf.decode_stream(table, sbytes, olen), np.uint8
            )
        out.append(dec)
    return out


def _huf_batch_dev(stream_list):
    """Device-resident batch Huffman decode: returns (dec uint8[W, out_bound]
    on device, out_bound). Empty input yields a (1, 8) dummy."""
    jax, jnp = _jx()
    from .tpu_codec import _get_huf_decode_fn, _words_from_bytes

    if not stream_list:
        return jnp.zeros((1, 8), jnp.uint8), 8
    from .tpu_codec import _get_huf_decode_packed_fn

    out_bound = 1 << max(max(olen for _, olen, _ in stream_list) - 1, 1).bit_length()
    word_bound = 1 << max(
        ((max(len(s) for s, _, _ in stream_list) + 3) // 4).bit_length(), 4
    )
    W = len(stream_list)
    Wp = 1 << max((W - 1).bit_length(), 2)
    words = np.zeros((Wp, word_bound), np.uint32)
    starts = np.zeros(Wp, np.int32)
    tbl_idx = np.zeros(Wp, np.int32)
    # Dedupe tables by identity: the 4 streams of a block share one.
    tables = []
    tbl_of = {}
    for i, (sbytes, olen, table) in enumerate(stream_list):
        w, sb = _words_from_bytes(sbytes, word_bound)
        words[i] = w
        starts[i] = sb
        ti = tbl_of.get(id(table))
        if ti is None:
            ti = tbl_of[id(table)] = len(tables)
            tables.append(table)
        tbl_idx[i] = ti
    T = len(tables)
    Tp = 1 << max((T - 1).bit_length(), 1)
    packed = np.zeros((Tp, 2048), np.int16)
    mbs = np.ones(Tp, np.int32)
    for ti, table in enumerate(tables):
        size = 1 << table.max_bits
        packed[ti, :size] = (
            table.symbol.astype(np.int32) | (table.nb_bits.astype(np.int32) << 8)
        ).astype(np.int16)
        mbs[ti] = table.max_bits
    fn = _get_huf_decode_packed_fn(word_bound, out_bound)
    out = fn(
        jnp.asarray(words), jnp.asarray(starts), jnp.asarray(tbl_idx),
        jnp.asarray(packed), jnp.asarray(mbs),
    )
    return out, out_bound


def _fse_batch_dev(seq_blocks):
    """Device-resident batch FSE decode: returns (lls, mls, offs, ofvs) as
    device int32[B, seq_bound] plus seq_bound. Empty input yields dummies."""
    jax, jnp = _jx()
    from .tpu_codec import _get_fse_decode_fn, _words_from_bytes

    if not seq_blocks:
        z = jnp.zeros((1, 32), jnp.int32)
        return (z, z, jnp.ones((1, 32), jnp.int32),
                jnp.full((1, 32), 4, jnp.int32),
                jnp.zeros(1, bool), 32)
    from .tpu_codec import _get_fse_decode_packed_fn

    seq_bound = 1 << max((max(d["nseq"] for d in seq_blocks) - 1).bit_length(), 5)
    word_bound = 1 << max(
        ((max(len(d["payload"]) for d in seq_blocks) + 3) // 4).bit_length(), 4
    )
    B = len(seq_blocks)
    Bp = 1 << max((B - 1).bit_length(), 2)
    words = np.zeros((Bp, word_bound), np.uint32)
    starts = np.zeros(Bp, np.int32)
    nseqs = np.zeros(Bp, np.int32)
    tidx = np.zeros((Bp, 3), np.int32)
    # Dedupe decode tables by identity (Repeat_Mode blocks share them).
    tables = []
    tbl_of = {}

    def table_index(t):
        ti = tbl_of.get(id(t))
        if ti is None:
            ti = tbl_of[id(t)] = len(tables)
            tables.append(t)
        return ti

    for i, d in enumerate(seq_blocks):
        w, sb = _words_from_bytes(d["payload"], word_bound)
        words[i] = w
        starts[i] = sb
        nseqs[i] = d["nseq"]
        ll_t, of_t, ml_t = d["tables"]
        tidx[i] = [table_index(ll_t), table_index(of_t), table_index(ml_t)]
    T = len(tables)
    Tp = 1 << max((T - 1).bit_length(), 1)
    packed = np.zeros((Tp, 512), np.int32)
    logs_t = np.zeros(Tp, np.int32)
    for ti, t in enumerate(tables):
        size = 1 << t.accuracy_log
        packed[ti, :size] = (
            t.symbol.astype(np.int32)
            | (t.nb_bits.astype(np.int32) << 8)
            | (t.baseline.astype(np.int32) << 16)
        )
        logs_t[ti] = t.accuracy_log
    fn = _get_fse_decode_packed_fn(word_bound, seq_bound)
    lls, mls, offs, ofvs, _reps, hasrep = fn(
        jnp.asarray(words), jnp.asarray(starts), jnp.asarray(nseqs),
        jnp.asarray(tidx), jnp.asarray(packed), jnp.asarray(logs_t),
    )
    return lls, mls, offs, ofvs, hasrep, seq_bound


def _dec_totals_fn(seq_shape, map_shape, n_consts):
    """Per-frame output sizes from decoded (ll, ml) slots — used only for
    foreign frames that omit the content size."""
    key = ("dec_totals", seq_shape, map_shape, n_consts)
    if key in _fns:
        return _fns[key]
    jax, jnp = _jx()
    NB, seq_bound = seq_shape

    def fn(lls_b, mls_b, nseq_v, chunk_v, c_ll, c_ml, map_seq):
        k = jnp.arange(seq_bound, dtype=jnp.int32)[None, :]
        mask = k < nseq_v[:, None]
        used = jnp.sum(jnp.where(mask, lls_b[:NB], 0), axis=1)
        trail = chunk_v - used
        ll_pool = jnp.concatenate([lls_b[:NB].reshape(-1), trail, c_ll])
        ml_pool = jnp.concatenate(
            [mls_b[:NB].reshape(-1), jnp.zeros_like(trail), c_ml]
        )
        return jnp.sum(
            ll_pool[map_seq].astype(jnp.int32) + ml_pool[map_seq], axis=1
        )

    _fns[key] = jax.jit(fn)
    return _fns[key]


def _dec_exec_fn(seq_shape, dec_shape, map_shape, lit_shape, static_len, n_consts, out_bound, n_doublings=None):
    key = ("dec_exec", seq_shape, dec_shape, map_shape, lit_shape, static_len, n_consts, out_bound, n_doublings)
    if key in _fns:
        return _fns[key]
    jax, jnp = _jx()
    from .ops.seq_exec import execute_sequences_batch

    NB, seq_bound = seq_shape
    _F, S, SEGS = map_shape
    _F2, L, SEGL = lit_shape

    def build_map(dest, base, nval, size, fill):
        # Dense index map from run segments (dest, base): position j maps
        # to base[seg] + (j - dest[seg]) with seg = rightmost dest <= j.
        # scatter-add + cumsum (NOT scatter-max + associative_scan: that
        # formulation is a 45-minute TPU compile at 2^20).
        def one(d, b, nv):
            counts = jnp.zeros(size, jnp.int32).at[d].add(1, mode="drop")
            seg = jnp.clip(jnp.cumsum(counts) - 1, 0, d.shape[0] - 1)
            j = jnp.arange(size, dtype=jnp.int32)
            m = b[seg] + (j - d[seg])
            return jnp.where(j < nv, m, fill)

        return jax.vmap(one)(dest, base, nval)

    def fn(lls_b, mls_b, offs_b, nseq_v, chunk_v, c_ll, c_ml, c_of,
           seq_dest, seq_base, nslots, lit_dest, lit_base, nlit_f,
           static_lits, dec_streams):
        k = jnp.arange(seq_bound, dtype=jnp.int32)[None, :]
        mask = k < nseq_v[:, None]
        used = jnp.sum(jnp.where(mask, lls_b[:NB], 0), axis=1)
        trail = chunk_v - used
        zero_t = jnp.zeros_like(trail)
        ll_pool = jnp.concatenate([lls_b[:NB].reshape(-1), trail, c_ll])
        ml_pool = jnp.concatenate([mls_b[:NB].reshape(-1), zero_t, c_ml])
        of_pool = jnp.concatenate([offs_b[:NB].reshape(-1), zero_t + 1, c_of])
        pad_slot = ll_pool.shape[0] - c_ll.shape[0]  # consts[0] = (0, 0, 1)
        map_seq = build_map(seq_dest, seq_base, nslots, S, pad_slot)
        lit_map = build_map(lit_dest, lit_base, nlit_f, L, 0)
        map_seq = jnp.clip(map_seq, 0, ll_pool.shape[0] - 1)
        lls = ll_pool[map_seq]
        mls = ml_pool[map_seq]
        offs = of_pool[map_seq]
        lit_flat = jnp.concatenate([static_lits, dec_streams.reshape(-1)])
        lit_map = jnp.clip(lit_map, 0, lit_flat.shape[0] - 1)
        lits = lit_flat[lit_map].astype(jnp.uint8)
        out, conv = execute_sequences_batch(
            lits, lls, mls, offs, out_bound, n_doublings
        )
        totals = jnp.sum(lls.astype(jnp.int32) + mls, axis=1)
        # Corruption flags (hostile-input taxonomy, reference:
        # lib/src/seek_table.rs:145-184 analog for frame payloads): a match
        # reaching before the frame start, or a sequence literal run
        # exceeding the block's literal budget (negative trailing run).
        pos_end = jnp.cumsum(lls.astype(jnp.int32) + mls, axis=1)
        match_pos = pos_end - mls
        bad = jnp.any(
            jnp.logical_or(
                jnp.logical_and(mls > 0, offs.astype(jnp.int32) > match_pos),
                lls < 0,
            ),
            axis=1,
        )
        return out, totals, bad, conv

    _fns[key] = jax.jit(fn)
    return _fns[key]

# --- serial-executor decode path ------------------------------------------

SERIAL_LITB = 128 << 10  # literal window per record (>= any block's budget)
SERIAL_OUTB_CAP = 1 << 22  # VMEM ceiling on the per-frame output scratch

# Observability: archives that fell off the serial kernel back to the
# pointer-doubling path (round-2 verdict: silent fallbacks must be counted).
_serial_fallbacks = {"count": 0, "reason": ""}


def serial_fallback_count() -> int:
    return _serial_fallbacks["count"]


def _serial_layout(plans, frame_rows, huf_out_bound, sbd, rpb):
    """Record table + literal-pool segments for the serial executor.
    Returns None when a guard trips (oversize hostile shapes)."""
    from .ops import exec_kernel as ek

    F = len(plans)
    static_lits = bytearray()
    frames_blocks = []
    lit_segs = [[] for _ in range(F)]  # (pool offset, len, is_static)
    si = 0
    for fi, (hdr, plan, _) in enumerate(plans):
        rows = list(frame_rows[fi])
        blocks = []
        for kind, *args in plan:
            if kind == "raw":
                data_b = args[0]
                if len(data_b) > SERIAL_LITB:
                    return None
                lit_segs[fi].append((len(static_lits), len(data_b), True))
                static_lits += data_b
                blocks.append(("lit", len(data_b)))
            elif kind == "rle":
                blocks.append(("rle", args[1], args[0]))
            else:
                d = args[0]
                if "streams" in d:
                    chunk_len = 0
                    for _sbytes, olen, _t in d["streams"]:
                        lit_segs[fi].append((si * huf_out_bound, olen, False))
                        si += 1
                        chunk_len += olen
                else:
                    lb = d.get("lit_bytes", b"")
                    lit_segs[fi].append((len(static_lits), len(lb), True))
                    static_lits += lb
                    chunk_len = len(lb)
                if chunk_len > SERIAL_LITB:
                    return None
                n = d.get("nseq", 0)
                if n == 0:
                    blocks.append(("lit", chunk_len))
                else:
                    r = rows.pop(0)
                    blocks.append(("seq", r * rpb, n, chunk_len))
        frames_blocks.append(blocks)
    meta, n_rec = ek.build_records(frames_blocks, sbd)
    return meta, lit_segs, static_lits


def _serial_exec_fn(SBd, LITB, OUTB, NRECP, F, LROWS, seq_shape, dec_shape,
                    static_len, SEGL):
    key = ("serial_exec", SBd, LITB, OUTB, NRECP, F, LROWS, seq_shape,
           dec_shape, static_len, SEGL)
    if key in _fns:
        return _fns[key]
    jax, jnp = _jx()
    from .ops.exec_kernel import get_exec_kernel

    kern = get_exec_kernel(
        SBd, LITB, OUTB, NRECP, F, LROWS,
        interpret=jax.default_backend() != "tpu",
    )
    LBYTES = LROWS * 128

    def fn(meta, lls_b, mls_b, ofvs_b, lit_dest, lit_base, nlit_f,
           static_lits, dec_streams):
        # Per-frame flat literal stream from run segments (dest, base):
        # the same scatter-add + cumsum segment-id map as the doubling
        # path, gathered once from [static pool | decoded huffman rows].
        def one(d, b, nv):
            counts = jnp.zeros(LBYTES, jnp.int32).at[d].add(1, mode="drop")
            seg = jnp.clip(jnp.cumsum(counts) - 1, 0, d.shape[0] - 1)
            j = jnp.arange(LBYTES, dtype=jnp.int32)
            m = b[seg] + (j - d[seg])
            return jnp.where(j < nv, m, 0)

        lit_map = jax.vmap(one)(lit_dest, lit_base, nlit_f)
        lit_flat = jnp.concatenate(
            [static_lits, dec_streams.reshape(-1)]
        )
        lit_map = jnp.clip(lit_map, 0, lit_flat.shape[0] - 1)
        lits = lit_flat[lit_map].astype(jnp.int32).reshape(F, LROWS, 128)
        rows_ll = lls_b.reshape(-1, SBd)
        rows_ml = mls_b.reshape(-1, SBd)
        rows_of = ofvs_b.reshape(-1, SBd)
        out, meta_out = kern(meta, rows_ll, rows_ml, rows_of, lits)
        return out.reshape(F, OUTB), meta_out

    _fns[key] = jax.jit(fn)
    return _fns[key]


def _serial_exec_dispatch(
    blob, plans, frame_starts, frame_rows, seq_blocks,
    lls_b, mls_b, ofvs_b, dec_seq_bound,
    dec_streams, huf_out_bound, seek_table,
    verify_checksum, return_device,
):
    """Decode every planned frame through the serial Pallas executor.
    Returns the archive bytes / (device rows, sizes), or NotImplemented
    when a size guard rules this archive out (counted)."""
    jax, jnp = _jx()
    from .errors import checksum_wrong, corruption_detected
    from .xxhash64 import XXH64
    from .jax_setup import phase_timer

    F = len(plans)
    # Output bound per frame: exact sizes from the seek table / headers,
    # else the block-count cap (a zstd block regenerates <= 128 KiB).
    bounds = []
    for fi, (hdr, plan, _) in enumerate(plans):
        if seek_table is not None:
            b = seek_table.frame_size_decomp(fi)
        elif hdr.content_size is not None:
            b = hdr.content_size
        else:
            b = len(plan) * ZSTD_BLOCK_SIZE_MAX
        bounds.append(b)
    max_bound = max(bounds)
    if max_bound > SERIAL_OUTB_CAP:
        _serial_fallbacks["count"] += 1
        _serial_fallbacks["reason"] = f"frame bound {max_bound} over cap"
        return NotImplemented
    OUTB = 1 << max((max_bound - 1).bit_length(), 12)

    SBd = min(2048, dec_seq_bound)
    rpb = dec_seq_bound // SBd
    with phase_timer("dec.serial_layout"):
        laid = _serial_layout(plans, frame_rows, huf_out_bound, SBd, rpb)
        if laid is None:
            _serial_fallbacks["count"] += 1
            _serial_fallbacks["reason"] = "oversize block literal budget"
            return NotImplemented
        meta, lit_segs, static_lits = laid

        LITB = SERIAL_LITB
        LRWS = LITB // 128 + 1
        nlit_f = np.zeros(F, np.int32)
        for fi in range(F):
            nlit_f[fi] = sum(g[1] for g in lit_segs[fi])
        LROWS = 1 << max((int(nlit_f.max()) // 128 + LRWS).bit_length(), 1)
        SEGL = 1 << max(
            (max((len(lit_segs[fi]) for fi in range(F)), default=1) - 1
             ).bit_length(), 2,
        )
        LBYTES = LROWS * 128
        sp = 1 << max((len(static_lits) - 1).bit_length()
                      if static_lits else 0, 7)
        static_np = np.zeros(sp, np.uint8)
        static_np[: len(static_lits)] = np.frombuffer(
            bytes(static_lits), np.uint8
        )
        lit_dest = np.full((F, SEGL), LBYTES, np.int32)
        lit_base = np.zeros((F, SEGL), np.int32)
        for fi in range(F):
            off = 0
            for k, (src, ln, is_static) in enumerate(lit_segs[fi]):
                lit_dest[fi, k] = off
                lit_base[fi, k] = src if is_static else sp + src
                off += ln

    with phase_timer("dec.serial_exec") as _pt:
        fn = _serial_exec_fn(
            SBd, LITB, OUTB, meta.shape[0], F, LROWS,
            tuple(lls_b.shape), tuple(dec_streams.shape), sp, SEGL,
        )
        out_dev, meta_out = fn(
            jnp.asarray(meta), lls_b, mls_b, ofvs_b,
            jnp.asarray(lit_dest), jnp.asarray(lit_base),
            jnp.asarray(nlit_f), jnp.asarray(static_np), dec_streams,
        )
        _pt.fence(out_dev)

    meta_np = np.asarray(meta_out)
    totals = meta_np[:, 0]
    bad = meta_np[:, 1]
    litc = meta_np[:, 2]
    for fi, (hdr, _p, _c) in enumerate(plans):
        if bad[fi]:
            raise corruption_detected(
                "match offset beyond window or literal overrun"
            )
        if litc[fi] != nlit_f[fi]:
            raise corruption_detected("literal budget mismatch")
        if hdr.content_size is not None and totals[fi] != hdr.content_size:
            raise corruption_detected("frame content size mismatch")
        if seek_table is not None and totals[fi] != bounds[fi]:
            raise corruption_detected("frame size disagrees with seek table")

    if return_device:
        return out_dev, [int(t) for t in totals]

    with phase_timer("dec.serial_pull+verify"):
        out = np.asarray(out_dev)
        parts = []
        for fi, (hdr, _p, cpos) in enumerate(plans):
            result = out[fi, : int(totals[fi])].tobytes()
            if hdr.has_checksum and verify_checksum:
                stored = int.from_bytes(blob[cpos : cpos + 4], "little")
                h = XXH64(0)
                h.update(result)
                if (h.digest() & 0xFFFF_FFFF) != stored:
                    raise checksum_wrong("content checksum mismatch")
            parts.append(result)
    return b"".join(parts)


# --- fused-decoder path (FSE decode + execution in one kernel) -------------

FUSED_WB_CAP = 16384  # words per block bitstream staged in SMEM (64 KiB)


def _fse_stage(seq_blocks):
    """Host staging shared with the FSE batch decode: bitstream words,
    start bits, deduped packed decode tables, per-block table indices."""
    from .tpu_codec import _words_from_bytes

    word_bound = 1 << max(
        ((max(len(d["payload"]) for d in seq_blocks) + 3) // 4).bit_length(), 4
    )
    B = len(seq_blocks)
    Bp = 1 << max((B - 1).bit_length(), 2)
    words = np.zeros((Bp, word_bound), np.uint32)
    starts = np.zeros(Bp, np.int32)
    tidx = np.zeros((Bp, 3), np.int32)
    tables = []
    tbl_of = {}

    def table_index(t):
        ti = tbl_of.get(id(t))
        if ti is None:
            ti = tbl_of[id(t)] = len(tables)
            tables.append(t)
        return ti

    for i, d in enumerate(seq_blocks):
        w, sb = _words_from_bytes(d["payload"], word_bound)
        words[i] = w
        starts[i] = sb
        ll_t, of_t, ml_t = d["tables"]
        tidx[i] = [table_index(ll_t), table_index(of_t), table_index(ml_t)]
    T = len(tables)
    Tp = 1 << max((T - 1).bit_length(), 1)
    packed = np.zeros((Tp, 512), np.int32)
    logs_t = np.zeros(Tp, np.int32)
    for ti, t in enumerate(tables):
        size = 1 << t.accuracy_log
        packed[ti, :size] = (
            t.symbol.astype(np.int32)
            | (t.nb_bits.astype(np.int32) << 8)
            | (t.baseline.astype(np.int32) << 16)
        )
        logs_t[ti] = t.accuracy_log
    return words, starts, tidx, packed, logs_t, word_bound


def _fused_exec_fn(WB, LITB, OUTB, NRECP, F, LROWS, words_shape, tab_shape):
    key = ("fused_exec", WB, LITB, OUTB, NRECP, F, LROWS, words_shape,
           tab_shape)
    if key in _fns:
        return _fns[key]
    jax, jnp = _jx()
    from .ops.decode_kernel import get_decode_kernel

    kern = get_decode_kernel(
        WB, LITB, OUTB, NRECP, F, LROWS,
        interpret=jax.default_backend() != "tpu",
    )

    def fn(consts, meta, words, tables, lits_u8):
        lits = lits_u8.astype(jnp.int32).reshape(F, LROWS, 128)
        out, meta_out = kern(consts, meta, words, tables, lits)
        return out.reshape(F, OUTB), meta_out

    _fns[key] = jax.jit(fn)
    return _fns[key]


def _ring_exec_fn(WB, LITB, OUTB, NRECP, F, LW, words_shape, tab_shape):
    """Glue for the all-scalar ring decoder (ops/ring_kernel.py): the
    literal pool arrives pre-packed as LE words from the host; output
    words unpack to bytes in one vector op."""
    key = ("ring_exec", WB, LITB, OUTB, NRECP, F, LW, words_shape,
           tab_shape)
    if key in _fns:
        return _fns[key]
    jax, jnp = _jx()
    from .ops import ring_kernel as rk

    kern = rk.get_ring_kernel(
        WB, LITB, OUTB, NRECP, F, LW,
        interpret=jax.default_backend() != "tpu",
    )

    def fn(consts, meta, words, tables, lit_words):
        outw, meta_out = kern(consts, meta, words, tables, lit_words)
        shifts = jnp.asarray([0, 8, 16, 24], jnp.int32)
        out = (
            (outw[..., None] >> shifts) & 0xFF
        ).astype(jnp.uint8).reshape(F, OUTB)
        return out, meta_out

    _fns[key] = jax.jit(fn)
    return _fns[key]


def _fused_decode_frames(blob, spans, verify_checksum=True):
    """Batched fused-kernel decode of arbitrary frame spans [(start,
    end), ...] of ``blob`` — ONE kernel dispatch for all of them (the
    sharded pipeline's redo path). Returns list[bytes] or NotImplemented
    on guard failure."""
    from .tpu_codec import _plan_frame

    plans = []
    for s, _e in spans:
        hdr, plan, fpos = _plan_frame(blob, s)
        plans.append((hdr, plan, fpos))
    stream_list = []
    seq_blocks = []
    frame_rows = []
    for _, plan, _ in plans:
        rows = []
        for kind, *args in plan:
            if kind == "cmp" and "streams" in args[0]:
                stream_list.extend(args[0]["streams"])
            if kind == "cmp" and args[0].get("nseq", 0) > 0:
                rows.append(len(seq_blocks))
                seq_blocks.append(args[0])
        frame_rows.append(rows)
    dec_list = _huf_batch_host(stream_list)
    return _fused_exec_dispatch(
        blob, plans, frame_rows, seq_blocks,
        dec_list, None, verify_checksum, False,
        return_parts=True,
    )


def _fused_exec_dispatch(
    blob, plans, frame_rows, seq_blocks,
    dec_list, seek_table,
    verify_checksum, return_device,
    prefixes=None, return_parts=False,
):
    """Decode every planned frame through the fused FSE+exec kernel —
    the FSE batch dispatch is skipped entirely. NotImplemented on guard
    failure (counted).

    ``dec_list``: host-decoded Huffman literal streams in plan order
    (``_huf_batch_host``); the per-frame literal pools are assembled on
    the host and uploaded once — no device Huffman dispatch, no
    index-map glue.

    ``prefixes``: optional per-frame ref_prefix bytes (DCtx::ref_prefix,
    reference lib/src/decode.rs:212-214) — each rides as a leading
    pseudo literal run sliced off the output; incompatible with
    return_device."""
    jax, jnp = _jx()
    from .errors import checksum_wrong, corruption_detected
    from .xxhash64 import XXH64
    from .jax_setup import phase_timer
    from .ops import decode_kernel as dk

    F = len(plans)
    plens = [len(p) if p else 0 for p in prefixes] if prefixes else [0] * F
    if any(plens):
        if return_device:
            return NotImplemented
        if max(plens) > SERIAL_LITB:
            _serial_fallbacks["count"] += 1
            _serial_fallbacks["reason"] = "prefix over literal budget"
            return NotImplemented
    bounds = []
    for fi, (hdr, plan, _) in enumerate(plans):
        if seek_table is not None:
            b = seek_table.frame_size_decomp(fi)
        elif hdr.content_size is not None:
            b = hdr.content_size
        else:
            b = len(plan) * ZSTD_BLOCK_SIZE_MAX
        bounds.append(b + plens[fi])
    max_bound = max(bounds)
    # Ring decoder eligibility: every frame's declared window (and any
    # prefix) fits the 512 KiB SMEM output ring. Wider windows keep the
    # vector-copy kernel. ZEEKSTD_TPU_RING=0 disables, =1 forces (CPU
    # interpret tests).
    from .ops import ring_kernel as _rk

    ring_env = _os.environ.get("ZEEKSTD_TPU_RING", "")
    use_ring = ring_env != "0" and all(
        (hdr.window_size or 0) <= _rk.RING and plens[fi] <= _rk.RING
        for fi, (hdr, _p, _c) in enumerate(plans)
    )
    if ring_env != "1" and jax.default_backend() != "tpu":
        use_ring = False
    if max_bound > (1 << 27):
        use_ring = False  # HBM word+byte rows would exceed ~2 GiB
    if not use_ring and max_bound > SERIAL_OUTB_CAP:
        _serial_fallbacks["count"] += 1
        _serial_fallbacks["reason"] = f"frame bound {max_bound} over cap"
        return NotImplemented

    with phase_timer("dec.fused_layout"):
        if seq_blocks:
            (words, starts, tidx, packed, logs_t,
             word_bound) = _fse_stage(seq_blocks)
            if word_bound > FUSED_WB_CAP:
                _serial_fallbacks["count"] += 1
                _serial_fallbacks["reason"] = "bitstream over SMEM cap"
                return NotImplemented
        else:
            words = np.zeros((2, 16), np.uint32)
            starts = np.zeros(2, np.int32)
            tidx = np.zeros((2, 3), np.int32)
            packed = np.zeros((1, 512), np.int32)
            logs_t = np.zeros(1, np.int32)
            word_bound = 16

        frames_blocks = []
        pool_parts = [[] for _ in range(F)]  # per-frame literal buffers
        si = 0
        bi_global = 0
        for fi, (hdr, plan, _) in enumerate(plans):
            rows = list(frame_rows[fi])
            blocks = []
            if plens[fi]:
                # ref_prefix as a leading pseudo literal run: match
                # offsets reach into it as ordinary output history.
                pool_parts[fi].append(np.frombuffer(prefixes[fi], np.uint8))
                blocks.append(("lit", plens[fi]))
            for kind, *args in plan:
                if kind == "raw":
                    data_b = args[0]
                    if len(data_b) > SERIAL_LITB:
                        _serial_fallbacks["count"] += 1
                        _serial_fallbacks["reason"] = "oversize raw block"
                        return NotImplemented
                    pool_parts[fi].append(np.frombuffer(data_b, np.uint8))
                    blocks.append(("lit", len(data_b)))
                elif kind == "rle":
                    blocks.append(("rle", args[1], args[0]))
                else:
                    d = args[0]
                    if "streams" in d:
                        chunk_len = 0
                        for _sb, olen, _t in d["streams"]:
                            pool_parts[fi].append(dec_list[si])
                            si += 1
                            chunk_len += olen
                    else:
                        lb = d.get("lit_bytes", b"")
                        pool_parts[fi].append(np.frombuffer(lb, np.uint8))
                        chunk_len = len(lb)
                    if chunk_len > SERIAL_LITB:
                        _serial_fallbacks["count"] += 1
                        _serial_fallbacks["reason"] = "oversize literal budget"
                        return NotImplemented
                    n = d.get("nseq", 0)
                    if n == 0:
                        blocks.append(("lit", chunk_len))
                    else:
                        r = rows.pop(0)
                        logs = (
                            int(logs_t[tidx[r, 0]])
                            | int(logs_t[tidx[r, 1]]) << 5
                            | int(logs_t[tidx[r, 2]]) << 10
                        )
                        blocks.append((
                            "seq", r, n, chunk_len,
                            int(tidx[r, 0]), int(tidx[r, 1]),
                            int(tidx[r, 2]), logs, int(starts[r]),
                        ))
                    bi_global += 1
            frames_blocks.append(blocks)
        meta, n_rec = dk.build_records(frames_blocks)

        OUTB = 1 << max((max_bound - 1).bit_length(), 12)
        LITB = SERIAL_LITB
        nlit_f = np.zeros(F, np.int32)
        pools = []
        for fi in range(F):
            pool = (
                np.concatenate(pool_parts[fi])
                if pool_parts[fi] else np.zeros(0, np.uint8)
            )
            pools.append(pool)
            nlit_f[fi] = len(pool)
        nlit_max = int(nlit_f.max()) if F else 0

    with phase_timer("dec.fused_exec") as _pt:
        # Frame-count bucketing: every other kernel dimension is already
        # a power-of-two bucket, so padding F keeps the Mosaic compile
        # key input-size independent (padded frames own no records).
        F_pad = 1 << max((F - 1).bit_length(), 2)
        if use_ring:
            # Literal pool rows as packed LE words, padded to a
            # 1024-word multiple (the kernel's staging granularity) plus
            # slack for the 8-byte over-reads.
            LW = max(-(-(nlit_max + 64) // 4096), 1) * 1024
            litw_np = np.zeros((F_pad, LW * 4), np.uint8)
            for fi in range(F):
                litw_np[fi, : nlit_f[fi]] = pools[fi]
            lit_dev = jnp.asarray(
                np.ascontiguousarray(litw_np).view(np.int32)
            )
            fn = _ring_exec_fn(
                word_bound, LITB, OUTB, meta.shape[0], F_pad, LW,
                tuple(words.shape), tuple(packed.shape),
            )
        else:
            LRWS = LITB // 128 + 1
            LROWS = 1 << max((nlit_max // 128 + LRWS).bit_length(), 1)
            lits_np = np.zeros((F_pad, LROWS * 128), np.uint8)
            for fi in range(F):
                lits_np[fi, : nlit_f[fi]] = pools[fi]
            lit_dev = jnp.asarray(lits_np)
            fn = _fused_exec_fn(
                word_bound, LITB, OUTB, meta.shape[0], F_pad, LROWS,
                tuple(words.shape), tuple(packed.shape),
            )
        # The kernel reads words as int32 scalars (logical shifts).
        out_dev, meta_out = fn(
            jnp.asarray(dk.make_consts()), jnp.asarray(meta),
            jnp.asarray(words.view(np.int32)), jnp.asarray(packed),
            lit_dev,
        )
        _pt.fence(out_dev)

    meta_np = np.asarray(meta_out)[:F]
    totals = meta_np[:, 0]
    bad = meta_np[:, 1]
    litc = meta_np[:, 2]
    from .errors import corruption_detected as _cd

    for fi, (hdr, _p, _c) in enumerate(plans):
        if bad[fi]:
            raise _cd("match offset beyond window or literal overrun")
        if litc[fi] != nlit_f[fi]:
            raise _cd("literal budget mismatch")
        if hdr.content_size is not None and (
            totals[fi] - plens[fi] != hdr.content_size
        ):
            raise _cd("frame content size mismatch")
        if seek_table is not None and totals[fi] != bounds[fi]:
            raise _cd("frame size disagrees with seek table")

    if return_device:
        return out_dev, [int(t) for t in totals]

    with phase_timer("dec.fused_pull+verify"):
        out = np.asarray(out_dev)
        parts = []
        for fi, (hdr, _p, cpos) in enumerate(plans):
            result = out[fi, plens[fi] : int(totals[fi])].tobytes()
            if hdr.has_checksum and verify_checksum:
                stored = int.from_bytes(blob[cpos : cpos + 4], "little")
                h = XXH64(0)
                h.update(result)
                if (h.digest() & 0xFFFF_FFFF) != stored:
                    raise checksum_wrong("content checksum mismatch")
            parts.append(result)
    return parts if return_parts else b"".join(parts)
