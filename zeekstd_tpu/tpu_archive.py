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

BLOCK_SIZE = ZSTD_BLOCK_SIZE_MAX

_fns = {}


def _jx():
    from .jax_setup import ensure_cache

    ensure_cache()
    import jax
    import jax.numpy as jnp

    return jax, jnp


def _parse_stats_fn(frame_size: int, seq_bound: int, blocks_per_frame: int):
    jax, jnp = _jx()
    key = ("parse_stats", frame_size, seq_bound, blocks_per_frame)
    if key in _fns:
        return _fns[key]

    from .codec.sequences import LL_BASE, ML_BASE
    from .ops.match_tpu import parse_frame

    ll_base = jnp.asarray(LL_BASE.astype(np.int32))
    ml_base = jnp.asarray(ML_BASE.astype(np.int32))
    B = blocks_per_frame

    def one_frame(data_u8, n_valid):
        lls, mls, offs, n_seq, lits, n_lit, n_raw = parse_frame(
            data_u8, BLOCK_SIZE, seq_bound, n_valid=n_valid
        )
        sidx = jnp.arange(seq_bound, dtype=jnp.int32)
        valid = sidx < n_seq
        out_len = lls + mls
        starts = jnp.cumsum(out_len) - out_len
        mstarts = starts + lls
        blk = jnp.clip(mstarts // BLOCK_SIZE, 0, B - 1)
        bstart = blk * BLOCK_SIZE
        adj_ll = mstarts - jnp.maximum(starts, bstart)
        ovs = offs + 3
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

        return (
            adj_ll, mls, ovs, ll_codes, ml_codes, of_codes, lits,
            n_seq, n_lit, n_raw,
            seq_cnt, first_idx, ml_sum, litcnt,
            ll_hist.reshape(B, 36), ml_hist.reshape(B, 53),
            of_hist.reshape(B, 32), lit_hist.reshape(B, 256),
        )

    _fns[key] = jax.jit(jax.vmap(one_frame))
    return _fns[key]


def _fse_blocks_fn(SB: int, word_bound: int):
    jax, jnp = _jx()
    key = ("fse_blocks", SB, word_bound)
    if key in _fns:
        return _fns[key]

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

    _fns[key] = jax.jit(
        jax.vmap(one_block, in_axes=(0,) * 6 + (0, 0) + (0,) * 9 + (0, 0, 0))
    )
    return _fns[key]


def _huf_blocks_fn(seg_bound: int, word_bound: int):
    jax, jnp = _jx()
    key = ("huf_blocks", seg_bound, word_bound)
    if key in _fns:
        return _fns[key]

    from .ops.entropy import huffman_encode_stream

    def one_stream(lits_f, start, n, codes, nb):
        seg = jax.lax.dynamic_slice(lits_f, (start,), (seg_bound,))
        return huffman_encode_stream(seg, n, codes, nb, word_bound)

    _fns[key] = jax.jit(jax.vmap(one_stream))
    return _fns[key]


def tpu_compress_archive(data: bytes, frame_size: int = 2 << 20, checksum: bool = False):
    """Compress ``data`` into seekable frames with the batched device
    pipeline; returns (frames_blob, SeekTable)."""
    jax, jnp = _jx()
    from .ops.bitpack import words_to_stream

    n = len(data)
    if n == 0:
        from .codec.compress import compress_frame

        blob = compress_frame(b"", level=1, checksum=checksum)
        st = SeekTable()
        st.log_frame(len(blob), 0)
        return blob, st

    F = -(-n // frame_size)
    B = -(-frame_size // BLOCK_SIZE)
    seq_bound = min(1 << 18, max(2048, frame_size // 8))

    frames = np.zeros((F, frame_size), np.uint8)
    lengths = np.zeros(F, np.int32)
    for i in range(F):
        chunk = data[i * frame_size : (i + 1) * frame_size]
        frames[i, : len(chunk)] = np.frombuffer(chunk, np.uint8)
        lengths[i] = len(chunk)

    # --- dispatch 1: parse + stats ---------------------------------------
    with phase_timer("enc.parse_dispatch"):
        parse = _parse_stats_fn(frame_size, seq_bound, B)
        out = parse(jnp.asarray(frames), jnp.asarray(lengths))
        (adj_ll, mls_d, ovs_d, llc_d, mlc_d, ofc_d, lits_d,
         n_seq, n_lit, n_raw,
         seq_cnt, first_idx, ml_sum, litcnt,
         ll_hist, ml_hist, of_hist, lit_hist) = out
        out[0].block_until_ready()

    # Pull ONLY the small stats.
    with phase_timer("enc.stats_pull"):
        n_seq = np.asarray(n_seq)
        n_raw = np.asarray(n_raw)
        seq_cnt = np.asarray(seq_cnt)
        first_idx = np.asarray(first_idx)
        litcnt = np.asarray(litcnt)
        ll_hist = np.asarray(ll_hist)
        ml_hist = np.asarray(ml_hist)
        of_hist = np.asarray(of_hist)
        lit_hist = np.asarray(lit_hist)

    # Frames whose parse overflowed fall back to the host encoder.
    overflow = n_raw > seq_bound

    # --- host: per-block decisions ---------------------------------------
    _t_host = phase_timer("enc.host_decisions").__enter__()
    blocks = []  # descriptors for device-encoded blocks
    for f in range(F):
        if overflow[f]:
            continue
        n_blocks_f = -(-int(lengths[f]) // BLOCK_SIZE)
        lit_lo = 0
        for b in range(n_blocks_f):
            b_len = min(BLOCK_SIZE, int(lengths[f]) - b * BLOCK_SIZE)
            desc = {
                "frame": f, "block": b, "len": b_len,
                "nseq": int(seq_cnt[f, b]), "first": int(first_idx[f, b]),
                "lit_lo": lit_lo, "nlit": int(litcnt[f, b]),
            }
            lit_lo += int(litcnt[f, b])
            blocks.append(desc)

    # Literal mode decisions + Huffman tables (host, from histograms).
    huf_jobs = []  # stream-level jobs for dispatch 3
    for d in blocks:
        f, b = d["frame"], d["block"]
        hist = lit_hist[f, b]
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
        freqs = {int(s): int(hist[s]) for s in nz}
        try:
            lengths_map = huf.package_merge_lengths(freqs)
            weights = huf.lengths_to_weights(lengths_map, int(nz.max()))
            tree = huf.write_weights(weights)
            codes, nb, _ = huf.build_encode_table(weights)
        except Exception:
            continue
        stream_bits = int(sum(hist[s] * nb[s] for s in nz))
        est = len(tree) + 6 + (stream_bits + 7) // 8 + 4 + 5
        if est >= nlit:
            continue
        d["lit_mode"] = "huf"
        d["tree"] = tree
        codes256 = np.zeros(256, np.uint32)
        codes256[: len(codes)] = codes
        nb256 = np.zeros(256, np.int32)
        nb256[: len(nb)] = nb
        seg = (nlit + 3) // 4
        segs = [seg, seg, seg, nlit - 3 * seg]
        d["huf_streams"] = []
        off = 0
        for sl in segs:
            d["huf_streams"].append(len(huf_jobs))
            huf_jobs.append((f, d["lit_lo"] + off, sl, codes256, nb256))
            off += sl

    # Sequence table choices from code histograms.
    fse_jobs = []
    for d in blocks:
        if d["nseq"] == 0:
            continue
        f, b = d["frame"], d["block"]
        choices = {}
        for cat, hist, defaults in (
            ("ll", ll_hist[f, b], (seq_mod.LL_DEFAULT_NORM, seq_mod.LL_DEFAULT_LOG, 35, 9)),
            ("of", of_hist[f, b], (seq_mod.OF_DEFAULT_NORM, seq_mod.OF_DEFAULT_LOG, 31, 8)),
            ("ml", ml_hist[f, b], (seq_mod.ML_DEFAULT_NORM, seq_mod.ML_DEFAULT_LOG, 52, 9)),
        ):
            codes_syn = np.repeat(
                np.arange(len(hist), dtype=np.int64), hist.astype(np.int64)
            )
            choices[cat] = _choose_table(codes_syn, cat, *defaults[:2], defaults[2], defaults[3])
        d["tables"] = choices
        d["fse_job"] = len(fse_jobs)
        fse_jobs.append(d)
    _t_host.__exit__()

    # --- dispatch 2: FSE blocks ------------------------------------------
    _t_fse = phase_timer("enc.fse_dispatch+pull").__enter__()
    fse_words = fse_bits = None
    if fse_jobs:
        SB = 1 << max(max(d["nseq"] for d in fse_jobs) - 1, 1).bit_length()
        SB = min(SB, seq_bound)
        word_bound = (SB * 64) // 32 + 16
        NB = len(fse_jobs)

        def dense(t, size):
            dn = np.zeros(64, np.int32); dn[: len(t.delta_nb_bits)] = t.delta_nb_bits
            df = np.zeros(64, np.int32); df[: len(t.delta_find_state)] = t.delta_find_state
            stt = np.zeros(size, np.int32); stt[: len(t.state_table)] = t.state_table
            return dn, df, stt

        arrs = {k: [] for k in (
            "first", "nseq", "ll_dn", "ll_df", "ll_st", "ml_dn", "ml_df",
            "ml_st", "of_dn", "of_df", "of_st", "llog", "mlog", "olog", "fidx",
        )}
        for d in fse_jobs:
            arrs["fidx"].append(d["frame"])
            arrs["first"].append(min(d["first"], seq_bound - SB) if SB <= seq_bound else 0)
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

        fidx = np.asarray(arrs["fidx"], np.int32)
        fn = _fse_blocks_fn(SB, word_bound)
        jnp_ = jnp
        fse_words, fse_bits = fn(
            adj_ll[fidx], mls_d[fidx], ovs_d[fidx],
            llc_d[fidx], mlc_d[fidx], ofc_d[fidx],
            jnp_.asarray(np.asarray(arrs["first"], np.int32) ),
            jnp_.asarray(np.asarray(arrs["nseq"], np.int32)),
            jnp_.asarray(np.stack(arrs["ll_dn"])), jnp_.asarray(np.stack(arrs["ll_df"])), jnp_.asarray(np.stack(arrs["ll_st"])),
            jnp_.asarray(np.stack(arrs["ml_dn"])), jnp_.asarray(np.stack(arrs["ml_df"])), jnp_.asarray(np.stack(arrs["ml_st"])),
            jnp_.asarray(np.stack(arrs["of_dn"])), jnp_.asarray(np.stack(arrs["of_df"])), jnp_.asarray(np.stack(arrs["of_st"])),
            jnp_.asarray(np.asarray(arrs["llog"], np.int32)),
            jnp_.asarray(np.asarray(arrs["mlog"], np.int32)),
            jnp_.asarray(np.asarray(arrs["olog"], np.int32)),
        )
        fse_bits = np.asarray(fse_bits)
        fse_words = np.asarray(fse_words)  # (NB, word_bound)
    _t_fse.__exit__()

    # --- dispatch 3: Huffman streams -------------------------------------
    _t_huf = phase_timer("enc.huf_dispatch+pull").__enter__()
    huf_words = huf_bits = None
    if huf_jobs:
        seg_bound = 1 << max(max(j[2] for j in huf_jobs) - 1, 1).bit_length()
        word_bound = (seg_bound * 12) // 32 + 8
        fn = _huf_blocks_fn(seg_bound, word_bound)
        fidx = np.asarray([j[0] for j in huf_jobs], np.int32)
        starts = np.asarray([j[1] for j in huf_jobs], np.int32)
        ns = np.asarray([j[2] for j in huf_jobs], np.int32)
        codes = np.stack([j[3] for j in huf_jobs])
        nbs = np.stack([j[4] for j in huf_jobs])
        huf_words, huf_bits = fn(
            lits_d[fidx], jnp.asarray(starts), jnp.asarray(ns),
            jnp.asarray(codes), jnp.asarray(nbs),
        )
        huf_words = np.asarray(huf_words)
        huf_bits = np.asarray(huf_bits)
    _t_huf.__exit__()

    # --- host assembly ----------------------------------------------------
    _t_asm = phase_timer("enc.host_assembly").__enter__()
    lits_host = None  # lazily pulled only if some block needs raw literals
    blob = bytearray()
    st = SeekTable()
    bi = 0
    for f in range(F):
        fdata = data[f * frame_size : f * frame_size + int(lengths[f])]
        if overflow[f]:
            from .codec.compress import compress_frame

            fbytes = compress_frame(fdata, level=1, checksum=checksum)
            blob += fbytes
            st.log_frame(len(fbytes), len(fdata))
            # skip this frame's block descriptors
            while bi < len(blocks) and blocks[bi]["frame"] == f:
                bi += 1
            continue

        fout = bytearray(
            frame_mod.write_frame_header(len(fdata), max(len(fdata), 1024), checksum)
        )
        n_blocks_f = -(-len(fdata) // BLOCK_SIZE)
        for b in range(n_blocks_f):
            d = blocks[bi]
            assert d["frame"] == f and d["block"] == b
            bi += 1
            last = b == n_blocks_f - 1
            raw_block = fdata[b * BLOCK_SIZE : b * BLOCK_SIZE + d["len"]]

            body = _assemble_body(
                d, raw_block, fse_words, fse_bits, huf_words, huf_bits,
                words_to_stream,
            )
            if body is None or len(body) >= d["len"]:
                if d["len"] > 0 and raw_block.count(raw_block[0]) == d["len"]:
                    fout += frame_mod.write_block_header(
                        last, frame_mod.BLOCK_RLE, d["len"]
                    )
                    fout += raw_block[:1]
                else:
                    fout += frame_mod.write_block_header(
                        last, frame_mod.BLOCK_RAW, d["len"]
                    )
                    fout += raw_block
            else:
                fout += frame_mod.write_block_header(
                    last, frame_mod.BLOCK_COMPRESSED, len(body)
                )
                fout += body
        if checksum:
            h = XXH64(0)
            h.update(fdata)
            fout += (h.digest() & 0xFFFF_FFFF).to_bytes(4, "little")
        blob += fout
        st.log_frame(len(fout), len(fdata))
    _t_asm.__exit__()
    return bytes(blob), st


def _assemble_body(d, raw_block, fse_words, fse_bits, huf_words, huf_bits, words_to_stream):
    """Build one compressed-block body from device outputs; None -> fallback."""
    if d["nseq"] == 0:
        return None
    # Literals section.
    nlit = d["nlit"]
    if d["lit_mode"] == "huf":
        parts = []
        for sj in d["huf_streams"]:
            parts.append(words_to_stream(huf_words[sj], int(huf_bits[sj])))
        if any(len(p) > 0xFFFF for p in parts[:3]):
            return None
        payload = d["tree"] + b"".join(
            len(p).to_bytes(2, "little") for p in parts[:3]
        ) + b"".join(parts)
        try:
            lit_sec = lit_mod.write_literals_header(
                lit_mod.LIT_COMPRESSED, nlit, len(payload), True
            ) + payload
        except Exception:
            return None
    elif d["lit_mode"] == "rle":
        lit_sec = lit_mod.write_literals_header(
            lit_mod.LIT_RLE, nlit, 0, False
        ) + bytes([d["rle_byte"]])
    else:
        # Raw literals require the literal bytes on host — fall back to a
        # raw block instead (these blocks are barely compressible anyway).
        return None

    # Sequences section.
    sec = bytearray(write_num_sequences(d["nseq"]))
    ll_mode = d["tables"]["ll"][0]
    of_mode = d["tables"]["of"][0]
    ml_mode = d["tables"]["ml"][0]
    sec.append((ll_mode << 6) | (of_mode << 4) | (ml_mode << 2))
    sec += d["tables"]["ll"][2] + d["tables"]["of"][2] + d["tables"]["ml"][2]
    j = d["fse_job"]
    if d.get("slice_shift", 0) != 0:
        return None  # slice clamp out of range (overflow guard)
    sec += words_to_stream(fse_words[j], int(fse_bits[j]))
    return lit_sec + bytes(sec)


def tpu_decompress_archive(blob: bytes, seek_table=None, verify_checksum: bool = True) -> bytes:
    """Batched device decode of a whole seekable archive — the decode twin
    of ``tpu_compress_archive``.

    All frames' Huffman literal streams decode in ONE vmapped dispatch, all
    blocks' FSE sequence streams in a second, and every frame's sequence
    execution in a third (``ops.seq_exec.execute_sequences_batch``); the
    host only parses headers/tables and stitches results. With a
    ``seek_table`` the frame boundaries come from it (reference analog:
    decompress through the seek table, lib/src/decode.rs); without one the
    frames are walked sequentially, skipping skippable frames.
    """
    jax, jnp = _jx()
    from .tpu_codec import (
        _plan_frame,
        _huf_batch,
        _fse_batch,
        _fix_rep_carry,
        _frame_triples,
    )
    from .ops.seq_exec import execute_sequences_batch
    from .xxhash64 import XXH64
    from .errors import checksum_wrong, corruption_detected

    # --- host: plan every frame ------------------------------------------
    _t_plan = phase_timer("dec.plan").__enter__()
    plans = []  # (hdr, plan, checksum_pos)
    if seek_table is not None:
        for i in range(seek_table.num_frames):
            start = seek_table.frame_start_comp(i)
            if seek_table.frame_size_decomp(i) == 0 and seek_table.frame_end_comp(i) == start:
                continue
            plans.append(_plan_frame(blob, start))
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
            pos = fpos + (4 if hdr.has_checksum else 0)

    _t_plan.__exit__()

    # --- device dispatch 1: all Huffman streams ---------------------------
    with phase_timer("dec.huf_batch"):
        stream_list = []
        frame_stream_base = []
        for _, plan, _ in plans:
            frame_stream_base.append(len(stream_list))
            for kind, *args in plan:
                if kind == "cmp" and "streams" in args[0]:
                    stream_list.extend(args[0]["streams"])
        decoded_streams = _huf_batch(stream_list)

    # --- device dispatch 2: all FSE sequence streams ----------------------
    with phase_timer("dec.fse_batch"):
        seq_blocks = []
        frame_rows = []  # per frame: list of batch-row indices
        for _, plan, _ in plans:
            rows = []
            for kind, *args in plan:
                if kind == "cmp" and args[0].get("nseq", 0) > 0:
                    rows.append(len(seq_blocks))
                    seq_blocks.append(args[0])
            frame_rows.append(rows)
        if seq_blocks:
            lls_b, mls_b, offs_b, ofvs_b = _fse_batch(seq_blocks)
    # Cross-block repeat-offset carry is per frame.
    with phase_timer("dec.rep_carry+triples"):
        seq_lookup = {}
        for rows in frame_rows:
            if not rows:
                continue
            frame_blocks = [seq_blocks[r] for r in rows]
            _fix_rep_carry(frame_blocks, rows, lls_b, ofvs_b, offs_b)
            for r in rows:
                seq_lookup[id(seq_blocks[r])] = (lls_b[r], mls_b[r], offs_b[r])

        # --- assemble per-frame triples -----------------------------------
        triples = []
        totals = []
        for fi, (hdr, plan, _) in enumerate(plans):
            lls, mls, offs, literals, _ = _frame_triples(
                plan, decoded_streams, frame_stream_base[fi], seq_lookup
            )
            triples.append((lls, mls, offs, literals))
            totals.append(int(lls.sum() + mls.sum()))

    if not plans:
        return b""

    # --- device dispatch 3: vmapped sequence execution --------------------
    with phase_timer("dec.seq_exec+pull"):
        F = len(plans)
        S = max(max(len(t[0]) for t in triples), 1)
        L = max(max(len(t[3]) for t in triples), 1)
        out_bound = max(max(totals), 1)
        lls_p = np.zeros((F, S), np.int32)
        mls_p = np.zeros((F, S), np.int32)
        offs_p = np.ones((F, S), np.int32)
        lits_p = np.zeros((F, L), np.uint8)
        for i, (lls, mls, offs, literals) in enumerate(triples):
            lls_p[i, : len(lls)] = lls
            mls_p[i, : len(mls)] = mls
            offs_p[i, : len(offs)] = offs
            lits_p[i, : len(literals)] = literals
        out = np.asarray(
            execute_sequences_batch(
                jnp.asarray(lits_p), jnp.asarray(lls_p), jnp.asarray(mls_p),
                jnp.asarray(offs_p), out_bound,
            )
        )

    # --- verify + join -----------------------------------------------------
    parts = []
    for i, (hdr, plan, cpos) in enumerate(plans):
        result = bytes(out[i, : totals[i]])
        if hdr.content_size is not None and len(result) != hdr.content_size:
            raise corruption_detected("frame content size mismatch")
        if hdr.has_checksum and verify_checksum:
            stored = int.from_bytes(blob[cpos : cpos + 4], "little")
            h = XXH64(0)
            h.update(result)
            if (h.digest() & 0xFFFF_FFFF) != stored:
                raise checksum_wrong("content checksum mismatch")
        parts.append(result)
    return b"".join(parts)
