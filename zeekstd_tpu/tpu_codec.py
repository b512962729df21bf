"""TPU-native frame codec: device kernels + host byte assembly.

Compression pipeline per frame (the "flagship model" of this framework):

  device: parallel LZ parse (ops.match_tpu)        — O(log n) passes
  device: code/extra-bit derivation (searchsorted) — vectorized
  host:   entropy table construction               — tiny, variable-bit
  device: FSE sequence bitstreams (ops.entropy)    — scan + parallel pack
  device: Huffman literal streams (ops.entropy)    — gather + parallel pack
  host:   section/frame byte assembly              — tiny

The produced frames are standard zstd (RFC 8878) — decodable by libzstd,
by the host decoder, and by the TPU decode path below. Host fallbacks
(raw/RLE blocks) apply whenever entropy coding does not pay, exactly like
the host encoder.

Decompression pipeline: host parses the tiny headers/tables, then the
device decodes Huffman literal streams and FSE sequence streams (scans
across streams/blocks) and executes sequences via pointer-doubling
(ops.seq_exec).
"""

from __future__ import annotations

import numpy as np

from .codec import frame as frame_mod
from .codec import huffman as huf
from .codec import literals as lit_mod
from .codec import sequences as seq_mod
from .codec.fse import build_encode_table
from .codec.seq_encode import _choose_table, write_num_sequences
from .constants import ZSTD_BLOCK_SIZE_MAX
from .xxhash64 import XXH64

_jax = None
_jnp = None
_fns = {}


def _lazy_jax():
    global _jax, _jnp
    if _jax is None:
        from .jax_setup import ensure_cache

        ensure_cache()
        import jax
        import jax.numpy as jnp

        _jax, _jnp = jax, jnp
    return _jax, _jnp


SEQ_BOUND = 1 << 18  # per-frame sequence bound; overflow falls back to host
BLOCK_SIZE = ZSTD_BLOCK_SIZE_MAX  # 128 KiB


def parse_and_code(data_u8, n_valid, seq_bound: int, block_size: int = BLOCK_SIZE):
    """Pure device function: parallel LZ parse + sequence-code derivation for
    one frame. This is the per-chip unit of the data-parallel pipeline
    (vmap over local frames, shard_map over the mesh)."""
    jax, jnp = _lazy_jax()
    from .ops.match_tpu import parse_frame, rep1_offset_values
    from .codec.sequences import LL_BASE, ML_BASE

    ll_base = jnp.asarray(LL_BASE.astype(np.int32))
    ml_base = jnp.asarray(ML_BASE.astype(np.int32))

    lls, mls, offs, n_seq, lits, n_lit, n_seq_raw = parse_frame(
        data_u8, block_size, seq_bound, n_valid=n_valid
    )
    # Same-block repeat-offset coding (rep code 1 when the offset repeats):
    # the block-clamped first sequence of a block is never rep-eligible
    # (its predecessor starts in the previous block), so the unclamped lls
    # are safe to test here.
    ov = rep1_offset_values(lls, lls, mls, offs, n_seq, block_size, seq_bound)
    # of code = bit_length(offset_value) - 1 == 31 - clz
    of_codes = 31 - jax.lax.clz(jnp.maximum(ov, 1))
    ll_codes = jnp.where(
        lls < 16,
        lls,
        jnp.searchsorted(ll_base, lls, side="right").astype(jnp.int32) - 1,
    )
    ml_codes = jnp.where(
        mls < 35,
        jnp.maximum(mls - 3, 0),
        jnp.searchsorted(ml_base, mls, side="right").astype(jnp.int32) - 1,
    )
    return lls, mls, ov, n_seq, lits, n_lit, ll_codes, ml_codes, of_codes, n_seq_raw


def _get_parse_fn(n_pad: int, seq_bound: int):
    jax, jnp = _lazy_jax()
    key = ("parse", n_pad, seq_bound)
    if key not in _fns:
        _fns[key] = jax.jit(
            lambda data_u8, n_valid: parse_and_code(data_u8, n_valid, seq_bound)
        )
    return _fns[key]


def _get_huf_encode_fn(lit_bound: int, word_bound: int):
    jax, jnp = _lazy_jax()
    key = ("huf_enc", lit_bound, word_bound)
    if key not in _fns:
        from .ops.entropy import huffman_encode_stream

        fn = jax.jit(
            jax.vmap(
                lambda lits, n, codes, nb: huffman_encode_stream(
                    lits, n, codes, nb, word_bound
                )
            )
        )
        _fns[key] = fn
    return _fns[key]


def tpu_compress_frame(data: bytes, checksum: bool = False) -> bytes:
    """Compress one frame with the TPU pipeline; returns a complete zstd
    frame, bit-compatible with every zstd decoder."""
    jax, jnp = _lazy_jax()
    from .ops.bitpack import words_to_stream

    n = len(data)
    if n == 0 or n < 64:
        from .codec.compress import compress_frame

        return compress_frame(data, level=1, checksum=checksum)

    n_pad = 1 << max((n - 1).bit_length(), 10)
    seq_bound = min(SEQ_BOUND, max(2048, n_pad // 8))  # >= worst case n/8
    padded = np.zeros(n_pad, np.uint8)
    padded[:n] = np.frombuffer(data, np.uint8)

    parse = _get_parse_fn(n_pad, seq_bound)
    results = parse(jnp.asarray(padded), n)
    if int(results[-1]) > seq_bound:
        # Parse overflowed the sequence bound: host fallback for safety.
        from .codec.compress import compress_frame

        return compress_frame(data, level=1, checksum=checksum)
    return assemble_frame(data, results, checksum)


def assemble_frame(data: bytes, parse_results, checksum: bool = False) -> bytes:
    """Host byte assembly from device parse results (the small, serial
    tail of the pipeline)."""
    jax, jnp = _lazy_jax()
    n = len(data)
    (lls, mls, ovs, n_seq, lits_dev, n_lit, ll_codes, ml_codes, of_codes) = parse_results[:9]

    n_seq = int(n_seq)
    n_lit = int(n_lit)
    lls = np.asarray(lls[:n_seq] if n_seq else lls[:0])
    mls = np.asarray(mls[:n_seq] if n_seq else mls[:0])
    ovs = np.asarray(ovs[:n_seq] if n_seq else ovs[:0])
    ll_codes_np = np.asarray(ll_codes[:n_seq] if n_seq else ll_codes[:0])
    ml_codes_np = np.asarray(ml_codes[:n_seq] if n_seq else ml_codes[:0])
    of_codes_np = np.asarray(of_codes[:n_seq] if n_seq else of_codes[:0])
    lits_np = np.asarray(lits_dev)[:n_lit]

    # Window covers the whole frame.
    window_size = max(n, 1024)
    out = bytearray(frame_mod.write_frame_header(n, window_size, checksum))

    # Per-block split (sequences are block-contained by construction).
    starts = np.concatenate([[0], np.cumsum(lls.astype(np.int64) + mls)])
    match_starts = starts[:-1] + lls
    lit_cum = np.concatenate([[0], np.cumsum(lls.astype(np.int64))])

    n_blocks = -(-n // BLOCK_SIZE)
    seq_block = match_starts // BLOCK_SIZE if n_seq else np.array([], np.int64)

    lit_consumed = 0
    for b in range(n_blocks):
        b_start = b * BLOCK_SIZE
        b_end = min(b_start + BLOCK_SIZE, n)
        b_len = b_end - b_start
        last = b == n_blocks - 1
        block_raw = bytes(data[b_start:b_end])

        idx = np.nonzero(seq_block == b)[0] if n_seq else np.array([], np.int64)
        nseq_b = len(idx)
        ml_sum = int(mls[idx].sum()) if nseq_b else 0
        nlit_b = b_len - ml_sum
        lits_b = lits_np[lit_consumed : lit_consumed + nlit_b].tobytes()
        lit_consumed += nlit_b

        body = _assemble_block(
            jnp, lits_b, idx, lls, mls, ovs,
            ll_codes_np, ml_codes_np, of_codes_np,
            match_starts, b_start, lits_dev,
            int(lit_cum[idx[0]]) if nseq_b else 0,
        )
        if body is None or len(body) >= b_len:
            if b_len > 0 and block_raw.count(block_raw[0]) == b_len:
                out += frame_mod.write_block_header(last, frame_mod.BLOCK_RLE, b_len)
                out += block_raw[:1]
            else:
                out += frame_mod.write_block_header(last, frame_mod.BLOCK_RAW, b_len)
                out += block_raw
        else:
            out += frame_mod.write_block_header(
                last, frame_mod.BLOCK_COMPRESSED, len(body)
            )
            out += body

    if checksum:
        h = XXH64(0)
        h.update(data)
        out += (h.digest() & 0xFFFF_FFFF).to_bytes(4, "little")
    return bytes(out)


def _assemble_block(
    jnp, lits_b, idx, lls, mls, ovs,
    ll_codes_np, ml_codes_np, of_codes_np,
    match_starts, b_start, lits_dev, lit_base,
):
    """Build one compressed-block body (literals + sequences sections) using
    the device entropy encoders; None when the block has no sequences worth
    encoding."""
    jax, _ = _lazy_jax()
    from .ops.bitpack import words_to_stream
    from .ops.entropy import fse_encode_sequences, huffman_encode_stream

    nseq_b = len(idx)
    if nseq_b == 0:
        return None

    # First sequence's literal run may have started in an earlier block;
    # clamp its ll to this block.
    ll_b = lls[idx].astype(np.int64).copy()
    first_run = int(match_starts[idx[0]] - max(
        match_starts[idx[0]] - ll_b[0], b_start
    ))
    ll_b[0] = first_run

    # Host entropy decisions + tables (shared with the host encoder).
    lit_section = _encode_literals_device(jnp, lits_b)

    llc = ll_codes_np[idx].copy()
    mlc = ml_codes_np[idx].copy()
    ofc = of_codes_np[idx].copy()
    # Recompute the first ll's code after clamping.
    llc[0] = _ll_code_host(int(ll_b[0]))

    section = bytearray(write_num_sequences(nseq_b))
    ll_mode, ll_t, ll_desc, _ = _choose_table(
        llc, "ll", seq_mod.LL_DEFAULT_NORM, seq_mod.LL_DEFAULT_LOG, 35, 9
    )
    of_mode, of_t, of_desc, _ = _choose_table(
        ofc, "of", seq_mod.OF_DEFAULT_NORM, seq_mod.OF_DEFAULT_LOG, 31, 8
    )
    ml_mode, ml_t, ml_desc, _ = _choose_table(
        mlc, "ml", seq_mod.ML_DEFAULT_NORM, seq_mod.ML_DEFAULT_LOG, 52, 9
    )
    section.append((ll_mode << 6) | (of_mode << 4) | (ml_mode << 2))
    section += ll_desc + of_desc + ml_desc

    # Extras.
    lle = (ll_b - seq_mod.LL_BASE[llc]).astype(np.int32)
    llb = seq_mod.LL_BITS[llc].astype(np.int32)
    mle = (mls[idx] - seq_mod.ML_BASE[mlc]).astype(np.int32)
    mlb = seq_mod.ML_BITS[mlc].astype(np.int32)
    ofe = (ovs[idx] - (1 << of_codes_np[idx])).astype(np.int32)
    ofb = of_codes_np[idx].astype(np.int32)

    S = 1 << max((nseq_b - 1).bit_length(), 5)
    word_bound = max((S * 64) // 32 + 8, 64)

    def pad(a, fill=0):
        out = np.full(S, fill, np.int32)
        out[:nseq_b] = a
        return jnp.asarray(out)

    def dense(t, size):
        dnb = np.zeros(64, np.int32)
        dnb[: len(t.delta_nb_bits)] = t.delta_nb_bits
        dfs = np.zeros(64, np.int32)
        dfs[: len(t.delta_find_state)] = t.delta_find_state
        stt = np.zeros(size, np.int32)
        stt[: len(t.state_table)] = t.state_table
        return jnp.asarray(dnb), jnp.asarray(dfs), jnp.asarray(stt)

    ll_dn, ll_df, ll_st = dense(ll_t, 512)
    ml_dn, ml_df, ml_st = dense(ml_t, 512)
    of_dn, of_df, of_st = dense(of_t, 256)

    words, total = jax.jit(
        fse_encode_sequences, static_argnames=("word_bound",)
    )(
        pad(llc), pad(mlc), pad(ofc),
        pad(lle), pad(mle), pad(ofe),
        pad(llb), pad(mlb), pad(ofb),
        nseq_b,
        ll_dn, ll_df, ll_st, ml_dn, ml_df, ml_st, of_dn, of_df, of_st,
        ll_t.accuracy_log, ml_t.accuracy_log, of_t.accuracy_log,
        word_bound=word_bound,
    )
    section += words_to_stream(np.asarray(words), int(total))
    return lit_section + bytes(section)


def _ll_code_host(ll: int) -> int:
    if ll < 16:
        return ll
    return int(np.searchsorted(seq_mod.LL_BASE, ll, side="right")) - 1


def _encode_literals_device(jnp, lits_b: bytes) -> bytes:
    """Literals section via the device Huffman encoder (host fallback for
    raw/RLE)."""
    jax, _ = _lazy_jax()
    from .ops.bitpack import words_to_stream
    from .ops.entropy import huffman_encode_stream

    n = len(lits_b)
    if n == 0:
        return lit_mod.write_literals_header(lit_mod.LIT_RAW, 0, 0, False)
    if lits_b.count(lits_b[0]) == n:
        return (
            lit_mod.write_literals_header(lit_mod.LIT_RLE, n, 0, False)
            + lits_b[:1]
        )
    raw = lit_mod.write_literals_header(lit_mod.LIT_RAW, n, 0, False) + lits_b
    if n < 64:
        return raw

    freqs_arr = np.bincount(np.frombuffer(lits_b, np.uint8), minlength=256)
    freqs = {int(s): int(c) for s, c in enumerate(freqs_arr) if c}
    if len(freqs) < 2:
        return raw
    try:
        lengths = huf.package_merge_lengths(freqs)
        weights = huf.lengths_to_weights(lengths, max(freqs))
        tree = huf.write_weights(weights)
        codes, nb, _ = huf.build_encode_table(weights)
    except Exception:
        return raw

    codes256 = np.zeros(256, np.uint32)
    codes256[: len(codes)] = codes
    nb256 = np.zeros(256, np.int32)
    nb256[: len(nb)] = nb
    codes_d = jnp.asarray(codes256)
    nb_d = jnp.asarray(nb256)

    seg = (n + 3) // 4
    segs = [lits_b[0:seg], lits_b[seg : 2 * seg], lits_b[2 * seg : 3 * seg], lits_b[3 * seg :]]
    lit_bound = 1 << max((seg - 1).bit_length(), 6)
    word_bound = (lit_bound * 12) // 32 + 8

    enc = _get_huf_encode_fn(lit_bound, word_bound)
    stacked = np.zeros((4, lit_bound), np.uint8)
    lens = np.zeros(4, np.int32)
    for i, s in enumerate(segs):
        stacked[i, : len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    words, totals = enc(
        jnp.asarray(stacked), jnp.asarray(lens),
        jnp.broadcast_to(codes_d, (4, 256)), jnp.broadcast_to(nb_d, (4, 256)),
    )
    words = np.asarray(words)
    totals = np.asarray(totals)
    parts = [words_to_stream(words[i], int(totals[i])) for i in range(4)]
    if any(len(p) > 0xFFFF for p in parts[:3]):
        return raw
    jump = b"".join(len(p).to_bytes(2, "little") for p in parts[:3])
    payload = tree + jump + b"".join(parts)
    try:
        header = lit_mod.write_literals_header(
            lit_mod.LIT_COMPRESSED, n, len(payload), True
        )
    except Exception:
        return raw
    if len(header) + len(payload) >= len(raw):
        return raw
    return header + payload


# --- decode path ---------------------------------------------------------


def _get_huf_decode_fn(word_bound: int, out_bound: int):
    jax, jnp = _lazy_jax()
    key = ("huf_dec", word_bound, out_bound)
    if key not in _fns:
        from .ops.huffman_spec import decode_stream_bitreach, decode_stream_spec

        # On TPU the loop-free bit-reachability decoder applies (Mosaic
        # chunk kernels); elsewhere the chunk-speculation scan is the twin.
        # The count is implied by the stream and validated against out_len
        # by the seek-table/frame-size checks downstream.
        import os

        use_bitreach = (
            jax.default_backend() == "tpu"
            and os.environ.get("ZEEKSTD_TPU_HUF") != "spec"
        )

        def one(words, start_bits, sym, nb, max_bits):
            dec = decode_stream_bitreach if use_bitreach else decode_stream_spec
            out, _n = dec(words, start_bits, out_bound, sym, nb, max_bits)
            return out

        _fns[key] = jax.jit(jax.vmap(one))
    return _fns[key]


def _get_huf_decode_packed_fn(word_bound: int, out_bound: int):
    """Batch Huffman decode taking PACKED per-block tables: streams carry a
    block index into int16[T, 2048] (symbol | nb_bits << 8) tables — 4
    streams share one table and entries are 4x narrower than the separate
    int32 sym/nb staging, a 16x upload cut on this latency-heavy link."""
    jax, jnp = _lazy_jax()
    key = ("huf_dec_packed", word_bound, out_bound)
    if key not in _fns:
        from .ops.huffman_spec import decode_stream_bitreach, decode_stream_spec

        import os

        use_bitreach = (
            jax.default_backend() == "tpu"
            and os.environ.get("ZEEKSTD_TPU_HUF") != "spec"
        )

        def fn(words, start_bits, tbl_idx, packed_tables, max_bits_t):
            def one(w, sb, ti):
                packed = packed_tables[ti].astype(jnp.int32)
                sym = packed & 0xFF
                nb = packed >> 8
                mb = max_bits_t[ti]
                dec = (
                    decode_stream_bitreach if use_bitreach else decode_stream_spec
                )
                out, _n = dec(w, sb, out_bound, sym, nb, mb)
                return out

            return jax.vmap(one)(words, start_bits, tbl_idx)

        _fns[key] = jax.jit(fn)
    return _fns[key]


def _get_fse_decode_packed_fn(word_bound: int, seq_bound: int):
    """Batch FSE sequence decode with PACKED deduped tables: each block
    carries per-category table indices into int32[T, 512] entries
    (symbol | nb_bits << 8 | baseline << 16; of tables pad to 512) —
    Repeat_Mode blocks share tables, cutting the dense staging ~6-9x."""
    jax, jnp = _lazy_jax()
    key = ("fse_dec_packed", word_bound, seq_bound)
    if key not in _fns:
        from .ops.entropy import fse_decode_sequences

        ll_cb = jnp.asarray(seq_mod.LL_BASE.astype(np.int32))
        ll_bb = jnp.asarray(seq_mod.LL_BITS.astype(np.int32))
        ml_cb = jnp.asarray(seq_mod.ML_BASE.astype(np.int32))
        ml_bb = jnp.asarray(seq_mod.ML_BITS.astype(np.int32))

        def fn(words, start_bits, n_seq, tidx, packed_tables, logs_t):
            def unpack(ti):
                pt = packed_tables[ti]
                return pt & 0xFF, (pt >> 8) & 0xFF, pt >> 16

            def one(w, sb, n, ti3):
                lls, lln, llb = unpack(ti3[0])
                ofs, ofn, ofb = unpack(ti3[1])
                mls, mln, mlb = unpack(ti3[2])
                dec_lls, dec_mls, dec_offs, dec_ofvs, reps = fse_decode_sequences(
                    w, sb, seq_bound, n,
                    lls, lln, llb, ofs[:256], ofn[:256], ofb[:256],
                    mls, mln, mlb,
                    logs_t[ti3[0]], logs_t[ti3[1]], logs_t[ti3[2]],
                    ll_cb, ll_bb, ml_cb, ml_bb,
                )
                k = jnp.arange(dec_ofvs.shape[0], dtype=jnp.int32)
                valid = k < n
                safe = (dec_ofvs == 1) & (dec_lls > 0) & (k >= 1)
                hasrep = jnp.any(valid & (dec_ofvs <= 3) & (~safe))
                return dec_lls, dec_mls, dec_offs, dec_ofvs, reps, hasrep

            return jax.vmap(one)(words, start_bits, n_seq, tidx)

        _fns[key] = jax.jit(fn)
    return _fns[key]


def _get_fse_decode_fn(word_bound: int, seq_bound: int):
    jax, jnp = _lazy_jax()
    key = ("fse_dec", word_bound, seq_bound)
    if key not in _fns:
        from .ops.entropy import fse_decode_sequences

        ll_cb = jnp.asarray(seq_mod.LL_BASE.astype(np.int32))
        ll_bb = jnp.asarray(seq_mod.LL_BITS.astype(np.int32))
        ml_cb = jnp.asarray(seq_mod.ML_BASE.astype(np.int32))
        ml_bb = jnp.asarray(seq_mod.ML_BITS.astype(np.int32))

        def one(words, start_bits, n_seq, lls, lln, llb, ofs, ofn, ofb, mls, mln, mlb, llog, olog, mlog):
            dec_lls, dec_mls, dec_offs, dec_ofvs, reps = fse_decode_sequences(
                words, start_bits, seq_bound, n_seq,
                lls, lln, llb, ofs, ofn, ofb, mls, mln, mlb,
                llog, olog, mlog,
                ll_cb, ll_bb, ml_cb, ml_bb,
            )
            # Cross-block repeat-carry flag, folded into this dispatch so
            # the archive decoder needs no separate hasrep round trip:
            # same-block rep1 (ofv==1, ll>0, not the first sequence)
            # resolves against the fresh per-block history; any other
            # repeat form may depend on earlier blocks.
            k = jnp.arange(dec_ofvs.shape[0], dtype=jnp.int32)
            valid = k < n_seq
            safe = (dec_ofvs == 1) & (dec_lls > 0) & (k >= 1)
            hasrep = jnp.any(valid & (dec_ofvs <= 3) & (~safe))
            return dec_lls, dec_mls, dec_offs, dec_ofvs, reps, hasrep

        _fns[key] = jax.jit(jax.vmap(one))
    return _fns[key]


def _words_from_bytes(payload: bytes, word_bound: int):
    """Little-endian uint32 words + payload bit length (strips the sentinel)."""
    from .codec.bitstream import BackwardBitReader

    br = BackwardBitReader(payload)
    start_bits = br.remaining
    arr = np.zeros(word_bound, np.uint32)
    padded = payload.ljust((len(payload) + 3) // 4 * 4, b"\0")
    w = np.frombuffer(padded, "<u4")
    arr[: len(w)] = w
    return arr, start_bits


def _plan_frame(frame: bytes, pos: int = 0):
    """Host side of one frame's decode: walk block/section headers and
    entropy-table descriptions into a device-ready plan (no symbol loops).
    Returns (hdr, plan, end_pos) with end_pos at the content checksum
    position (if any). Plan entries: ("raw", bytes) | ("rle", byte, n) |
    ("cmp", desc)."""
    from .errors import corruption_detected
    hdr = frame_mod.parse_frame_header(frame[pos:])
    fpos = pos + hdr.header_size

    # --- host: walk blocks, parse headers + tables -----------------------
    plan = []  # per block: ("raw", bytes) | ("rle", byte, n) | ("cmp", desc)
    prev_table = None
    _dec_state = {}  # per-frame repeat-mode FSE tables

    while True:
        last, btype, bsize, consumed = frame_mod.parse_block_header(frame[fpos:])
        fpos += consumed
        if btype == frame_mod.BLOCK_RAW:
            plan.append(("raw", frame[fpos : fpos + bsize]))
            fpos += bsize
        elif btype == frame_mod.BLOCK_RLE:
            plan.append(("rle", frame[fpos], bsize))
            fpos += 1
        else:
            block = frame[fpos : fpos + bsize]
            fpos += bsize
            sec = lit_mod.parse_literals_header(block)
            bpos = sec.header_size
            desc = {"lit_type": sec.lit_type, "regen": sec.regenerated_size}
            if sec.lit_type == lit_mod.LIT_RAW:
                desc["lit_bytes"] = block[bpos : bpos + sec.regenerated_size]
                bpos += sec.regenerated_size
            elif sec.lit_type == lit_mod.LIT_RLE:
                desc["lit_bytes"] = bytes([block[bpos]]) * sec.regenerated_size
                bpos += 1
            else:
                payload = block[bpos : bpos + sec.compressed_size]
                bpos += sec.compressed_size
                if sec.lit_type == lit_mod.LIT_COMPRESSED:
                    weights, wconsumed = huf.read_weights(payload)
                    prev_table = huf.build_decode_table(weights)
                    payload = payload[wconsumed:]
                if prev_table is None:
                    raise corruption_detected("treeless literals without table")
                table = prev_table
                if sec.four_streams:
                    s1 = int.from_bytes(payload[0:2], "little")
                    s2 = int.from_bytes(payload[2:4], "little")
                    s3 = int.from_bytes(payload[4:6], "little")
                    rest = payload[6:]
                    seg = (sec.regenerated_size + 3) // 4
                    lens = [seg, seg, seg, sec.regenerated_size - 3 * seg]
                    sizes = [s1, s2, s3, len(rest) - s1 - s2 - s3]
                    off = 0
                    desc["streams"] = []
                    for ssize, olen in zip(sizes, lens):
                        desc["streams"].append(
                            (rest[off : off + ssize], olen, table)
                        )
                        off += ssize
                else:
                    desc["streams"] = [(payload, sec.regenerated_size, table)]

            rest = block[bpos:]
            nseq, nconsumed = seq_mod.parse_num_sequences(rest)
            rest = rest[nconsumed:]
            desc["nseq"] = nseq
            if nseq > 0:
                modes = rest[0]
                rest = rest[1:]
                st = _dec_state
                ll_t, c = seq_mod.read_symbol_table(rest, (modes >> 6) & 3, "ll", st.get("ll"))
                rest = rest[c:]
                of_t, c = seq_mod.read_symbol_table(rest, (modes >> 4) & 3, "of", st.get("of"))
                rest = rest[c:]
                ml_t, c = seq_mod.read_symbol_table(rest, (modes >> 2) & 3, "ml", st.get("ml"))
                rest = rest[c:]
                st["ll"], st["of"], st["ml"] = ll_t, of_t, ml_t
                desc["tables"] = (ll_t, of_t, ml_t)
                desc["payload"] = rest
            plan.append(("cmp", desc))
        if last:
            break

    return hdr, plan, fpos


def _huf_batch(stream_list):
    """One vmapped device dispatch decoding every Huffman literal stream
    (any number of frames' worth). stream_list: [(bytes, out_len, table)]."""
    jax, jnp = _lazy_jax()
    decoded_streams = []
    if stream_list:
        out_bound = 1 << max(max(olen for _, olen, _ in stream_list) - 1, 1).bit_length()
        word_bound = 1 << max(
            ((max(len(s) for s, _, _ in stream_list) + 3) // 4).bit_length(), 4
        )
        W = len(stream_list)
        words = np.zeros((W, word_bound), np.uint32)
        starts = np.zeros(W, np.int32)
        syms = np.zeros((W, 2048), np.int32)
        nbs = np.zeros((W, 2048), np.int32)
        mbs = np.zeros(W, np.int32)
        for i, (sbytes, olen, table) in enumerate(stream_list):
            w, sb = _words_from_bytes(sbytes, word_bound)
            words[i] = w
            starts[i] = sb
            size = 1 << table.max_bits
            syms[i, :size] = table.symbol
            nbs[i, :size] = table.nb_bits
            mbs[i] = table.max_bits
        fn = _get_huf_decode_fn(word_bound, out_bound)
        out = np.asarray(
            fn(jnp.asarray(words), jnp.asarray(starts), jnp.asarray(syms), jnp.asarray(nbs), jnp.asarray(mbs))
        )
        decoded_streams = [bytes(out[i, : stream_list[i][1]]) for i in range(W)]

    return decoded_streams


def _fse_batch(seq_blocks):
    """One vmapped device dispatch decoding every block's FSE sequence
    stream. Returns numpy (lls, mls, offs, ofvs), each [B, seq_bound];
    repeat offsets are resolved against a fresh history per block (the
    caller fixes cross-block carry per frame)."""
    jax, jnp = _lazy_jax()
    if seq_blocks:
        seq_bound = 1 << max((max(d["nseq"] for d in seq_blocks) - 1).bit_length(), 5)
        word_bound = 1 << max(
            ((max(len(d["payload"]) for d in seq_blocks) + 3) // 4).bit_length(), 4
        )
        B = len(seq_blocks)
        words = np.zeros((B, word_bound), np.uint32)
        starts = np.zeros(B, np.int32)
        nseqs = np.zeros(B, np.int32)
        dense = {
            k: np.zeros((B, size), np.int32)
            for k, size in (
                ("lls", 512), ("lln", 512), ("llb", 512),
                ("ofs", 256), ("ofn", 256), ("ofb", 256),
                ("mls", 512), ("mln", 512), ("mlb", 512),
            )
        }
        logs = np.zeros((B, 3), np.int32)
        for i, d in enumerate(seq_blocks):
            w, sb = _words_from_bytes(d["payload"], word_bound)
            words[i] = w
            starts[i] = sb
            nseqs[i] = d["nseq"]
            ll_t, of_t, ml_t = d["tables"]
            for pre, t in (("ll", ll_t), ("of", of_t), ("ml", ml_t)):
                size = 1 << t.accuracy_log
                dense[pre + "s"][i, :size] = t.symbol
                dense[pre + "n"][i, :size] = t.nb_bits
                dense[pre + "b"][i, :size] = t.baseline
            logs[i] = [ll_t.accuracy_log, of_t.accuracy_log, ml_t.accuracy_log]
        fn = _get_fse_decode_fn(word_bound, seq_bound)
        lls, mls, offs, ofvs, reps, _hasrep = fn(
            jnp.asarray(words), jnp.asarray(starts), jnp.asarray(nseqs),
            jnp.asarray(dense["lls"]), jnp.asarray(dense["lln"]), jnp.asarray(dense["llb"]),
            jnp.asarray(dense["ofs"]), jnp.asarray(dense["ofn"]), jnp.asarray(dense["ofb"]),
            jnp.asarray(dense["mls"]), jnp.asarray(dense["mln"]), jnp.asarray(dense["mlb"]),
            jnp.asarray(logs[:, 0]), jnp.asarray(logs[:, 1]), jnp.asarray(logs[:, 2]),
        )
        lls, mls, offs, ofvs = (
            np.asarray(lls), np.asarray(mls), np.array(offs), np.asarray(ofvs)
        )
        return lls, mls, offs, ofvs
    return None


def _fix_rep_carry(seq_blocks, rows, lls, ofvs, offs):
    """Re-resolve repeat offsets sequentially across ONE frame's blocks
    (batch rows ``rows`` of the _fse_batch arrays), mutating ``offs``.
    Same-block rep1 (ofv==1, ll>0, not the block's first sequence) is
    already exact under the per-block fresh history — our own encoder
    emits only that form — so the sequential pass runs only for the other
    repeat forms (foreign archives)."""

    def _unsafe(i):
        n = seq_blocks[i]["nseq"]
        ofv = ofvs[rows[i]][:n]
        ll = lls[rows[i]][:n]
        k = np.arange(n)
        safe = (ofv == 1) & (ll > 0) & (k >= 1)
        return bool(((ofv <= 3) & ~safe).any())

    any_rep_after_first = any(_unsafe(i) for i in range(1, len(seq_blocks)))
    if any_rep_after_first:
        r1, r2, r3 = 1, 4, 8
        for i, d in zip(rows, seq_blocks):
            n = d["nseq"]
            for k in range(n):
                ofv = int(ofvs[i][k])
                ll = int(lls[i][k])
                if ofv > 3:
                    off = ofv - 3
                    r1, r2, r3 = off, r1, r2
                else:
                    j = ofv + (1 if ll == 0 else 0)
                    if j == 1:
                        off = r1
                    elif j == 2:
                        off = r2
                        r1, r2 = r2, r1
                    elif j == 3:
                        off = r3
                        r1, r2, r3 = r3, r1, r2
                    else:
                        off = r1 - 1
                        r1, r2, r3 = off, r1, r2
                offs[i][k] = off


def _frame_triples(plan, decoded_streams, si, seq_lookup):
    """Assemble one frame's flat (lls, mls, offs, literals) arrays from its
    plan plus the batch-decoded streams/sequences. ``si`` is this frame's
    cursor into decoded_streams; returns (lls, mls, offs, literals, si)."""
    all_ll, all_ml, all_off = [], [], []
    lit_parts = []
    for kind, *args in plan:
        if kind == "raw":
            data = args[0]
            lit_parts.append(np.frombuffer(data, np.uint8))
            all_ll.append([len(data)]); all_ml.append([0]); all_off.append([1])
        elif kind == "rle":
            byte, nrep = args[0], args[1]
            lit_parts.append(np.frombuffer(bytes([byte]), np.uint8))
            if nrep > 1:
                all_ll.append([1, 0]); all_ml.append([0, nrep - 1]); all_off.append([1, 1])
            else:
                all_ll.append([1]); all_ml.append([0]); all_off.append([1])
        else:
            d = args[0]
            if "streams" in d:
                chunk = b"".join(
                    decoded_streams[si + k] for k in range(len(d["streams"]))
                )
                si += len(d["streams"])
            else:
                chunk = d.get("lit_bytes", b"")
            lit_parts.append(np.frombuffer(chunk, np.uint8))
            n = d.get("nseq", 0)
            if n == 0:
                all_ll.append([len(chunk)]); all_ml.append([0]); all_off.append([1])
            else:
                bl, bm, bo = seq_lookup[id(d)]
                used = int(bl[:n].sum())
                all_ll.append(list(bl[:n]) + [len(chunk) - used])
                all_ml.append(list(bm[:n]) + [0])
                all_off.append(list(bo[:n]) + [1])

    lls = np.concatenate([np.asarray(x, np.int64) for x in all_ll]).astype(np.int32)
    mls = np.concatenate([np.asarray(x, np.int64) for x in all_ml]).astype(np.int32)
    offs = np.concatenate([np.asarray(x, np.int64) for x in all_off]).astype(np.int32)
    literals = np.concatenate(lit_parts) if lit_parts else np.zeros(0, np.uint8)

    return lls, mls, offs, literals, si


def tpu_decompress_frame(frame: bytes, pos: int = 0, verify_checksum: bool = True,
                         prefix: bytes = b""):
    """Decode one zstd frame with the device kernels (host parses headers
    and entropy tables; Huffman/FSE symbol loops and sequence execution run
    on device). Returns (bytes, end_pos).

    ``prefix`` mirrors DCtx::ref_prefix (reference lib/src/decode.rs:212-214):
    match offsets may reach before the frame into it. It rides the device
    dispatch as a leading pseudo literal run (ll=len, ml=0) and is sliced
    off the output."""
    jax, jnp = _lazy_jax()
    from .errors import checksum_wrong, corruption_detected
    from .ops.seq_exec import execute_sequences_tpu

    hdr, plan, fpos = _plan_frame(frame, pos)

    # Fused serial kernel path (the archive decoder's default on TPU):
    # FSE decode + exact repeat resolution + sequence execution in one
    # grid — no host rep-carry, no pointer-doubling gathers. Falls
    # through to the classic path on guard failure.
    import os

    exec_mode = os.environ.get("ZEEKSTD_TPU_EXEC", "")
    if exec_mode == "fused" or (
        exec_mode not in ("serial", "doubling")
        and jax.default_backend() == "tpu"
    ):
        from .tpu_archive import _fused_exec_dispatch, _huf_batch_host

        stream_list = []
        rows = []
        seq_blocks_f = []
        for kind, *args in plan:
            if kind == "cmp" and "streams" in args[0]:
                stream_list.extend(args[0]["streams"])
            if kind == "cmp" and args[0].get("nseq", 0) > 0:
                rows.append(len(seq_blocks_f))
                seq_blocks_f.append(args[0])
        dec_list = _huf_batch_host(stream_list)
        res = _fused_exec_dispatch(
            frame, [(hdr, plan, fpos)], [rows], seq_blocks_f,
            dec_list, None, verify_checksum, False,
            prefixes=[prefix] if prefix else None,
        )
        if res is not NotImplemented:
            return res, fpos + (4 if hdr.has_checksum else 0)

    stream_list = []
    for kind, *args in plan:
        if kind == "cmp" and "streams" in args[0]:
            stream_list.extend(args[0]["streams"])
    decoded_streams = _huf_batch(stream_list)

    cmp_blocks = [args[0] for kind, *args in plan if kind == "cmp"]
    seq_blocks = [d for d in cmp_blocks if d.get("nseq", 0) > 0]
    seq_lookup = {}
    if seq_blocks:
        lls_b, mls_b, offs_b, ofvs_b = _fse_batch(seq_blocks)
        _fix_rep_carry(seq_blocks, list(range(len(seq_blocks))), lls_b, ofvs_b, offs_b)
        for i, d in enumerate(seq_blocks):
            seq_lookup[id(d)] = (lls_b[i], mls_b[i], offs_b[i])

    lls, mls, offs, literals, _ = _frame_triples(plan, decoded_streams, 0, seq_lookup)

    plen = len(prefix)
    if plen:
        # Prefix = a leading pseudo literal run: offsets into the prefix
        # land before the frame's first output byte naturally.
        lls = np.concatenate([[plen], lls]).astype(np.int32)
        mls = np.concatenate([[0], mls]).astype(np.int32)
        offs = np.concatenate([[1], offs]).astype(np.int32)
        literals = np.concatenate(
            [np.frombuffer(bytes(prefix), np.uint8), literals]
        )

    # Hostile-input validation before touching the device: matches must not
    # reach before the frame start, literal runs must not exceed the block
    # budget, and a declared size beyond the 1 GiB seekable frame cap must
    # not size any allocation (lib/src/lib.rs:53-58 analog).
    from .constants import SEEKABLE_MAX_FRAME_SIZE

    if hdr.content_size is not None and hdr.content_size > SEEKABLE_MAX_FRAME_SIZE:
        raise corruption_detected("declared frame size exceeds cap")
    pos_end = np.cumsum(lls.astype(np.int64) + mls)
    match_pos = pos_end - mls
    if np.any((mls > 0) & (offs.astype(np.int64) > match_pos)) or np.any(lls < 0):
        raise corruption_detected("match offset beyond window or literal overrun")

    total = int(lls.sum() + mls.sum())
    out_bound = max(total, 1)
    out, conv = execute_sequences_tpu(
        jnp.asarray(literals if literals.size else np.zeros(1, np.uint8)),
        jnp.asarray(lls), jnp.asarray(mls), jnp.asarray(offs), out_bound,
    )
    if not bool(conv):
        # Copy chains nested deeper than 2^N_DOUBLINGS segments: host decode.
        from .codec.decompress import decompress_frame

        return decompress_frame(frame, pos, prefix=prefix) if plen else (
            decompress_frame(frame, pos)
        )
    result = bytes(np.asarray(out)[plen:total])

    if hdr.content_size is not None and len(result) != hdr.content_size:
        raise corruption_detected("frame content size mismatch")
    if hdr.has_checksum:
        stored = int.from_bytes(frame[fpos : fpos + 4], "little")
        fpos += 4
        if verify_checksum:
            h = XXH64(0)
            h.update(result)
            if (h.digest() & 0xFFFF_FFFF) != stored:
                raise checksum_wrong("content checksum mismatch")
    return result, fpos


