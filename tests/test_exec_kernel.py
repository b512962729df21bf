"""Correctness harness for the serial Pallas sequence executor
(ops/exec_kernel.py) against a byte-serial numpy reference, run in
interpret mode on CPU. Covers the libzstd sequence-execution semantics
(reference hot loop: lib/src/decode.rs:242-256): repeat-offset history
threaded across blocks, overlapped matches, raw/RLE blocks, trailing
literals, block slicing, and multi-frame batches."""

import numpy as np
import pytest

from zeekstd_tpu.ops import exec_kernel as ek


def ref_execute(meta, rows_ll, rows_ml, rows_ofv, lits, n_rec, n_frames):
    """Byte-serial reference: returns (list of frame bytes, bad flags,
    lit consumed)."""
    outs = [bytearray() for _ in range(n_frames)]
    bads = [0] * n_frames
    litcs = [0] * n_frames
    state = {}
    for r in range(n_rec):
        f, kind, row, nseq, litn, flags, rleb, _ = meta[r]
        if kind == ek.KIND_NOP:
            continue
        if flags & ek.F_FRAME_START:
            state = {"r": [1, 4, 8], "bad": 0, "litcur": 0, "blit": 0}
        if flags & ek.F_BLOCK_START:
            state["blit"] = state["litcur"]
        out = outs[f]
        lit = lits[f]
        if kind == ek.KIND_SEQ:
            for j in range(nseq):
                ll = int(rows_ll[row, j])
                ml = int(rows_ml[row, j])
                ofv = int(rows_ofv[row, j])
                r1, r2, r3 = state["r"]
                if ofv > 3:
                    off = ofv - 3
                    state["r"] = [off, r1, r2]
                else:
                    ridx = ofv + (1 if ll == 0 else 0)
                    if ridx == 1:
                        off = r1
                    elif ridx == 2:
                        off = r2
                        state["r"] = [r2, r1, r3]
                    elif ridx == 3:
                        off = r3
                        state["r"] = [r3, r1, r2]
                    else:
                        off = r1 - 1
                        state["r"] = [off, r1, r2]
                lc = state["litcur"]
                out += bytes(lit[lc : lc + ll])
                state["litcur"] += ll
                if ml > 0:
                    if off <= 0 or off > len(out):
                        state["bad"] = 1
                        off = min(max(off, 1), max(len(out), 1))
                    for _ in range(ml):
                        out.append(out[-off])
            if flags & ek.F_BLOCK_END:
                trail = litn - (state["litcur"] - state["blit"])
                if trail < 0:
                    state["bad"] = 1
                    trail = 0
                lc = state["litcur"]
                out += bytes(lit[lc : lc + trail])
                state["litcur"] += trail
        elif kind == ek.KIND_LIT:
            lc = state["litcur"]
            out += bytes(lit[lc : lc + litn])
            state["litcur"] += litn
        elif kind == ek.KIND_RLE:
            out += bytes([rleb]) * litn
        if flags & ek.F_FRAME_END:
            bads[f] = state["bad"]
            litcs[f] = state["litcur"]
    return [bytes(o) for o in outs], bads, litcs


def run_kernel(meta, rows_ll, rows_ml, rows_ofv, lits_list, OUTB,
               SBd, LITB=2048):
    import jax.numpy as jnp

    F = len(lits_list)
    LRWS = LITB // 128 + 1
    max_lit = max((len(x) for x in lits_list), default=0)
    LROWS = -(-max_lit // 128) + LRWS
    lits = np.zeros((F, LROWS, 128), np.int32)
    for i, x in enumerate(lits_list):
        flat = np.zeros(LROWS * 128, np.int32)
        flat[: len(x)] = np.frombuffer(bytes(x), np.uint8)
        lits[i] = flat.reshape(LROWS, 128)
    fn = ek.get_exec_kernel(
        SBd, LITB, OUTB, meta.shape[0], F, LROWS, interpret=True
    )
    out, meta_out = fn(
        jnp.asarray(meta), jnp.asarray(rows_ll), jnp.asarray(rows_ml),
        jnp.asarray(rows_ofv), jnp.asarray(lits),
    )
    out = np.asarray(out).reshape(F, OUTB)
    meta_out = np.asarray(meta_out)
    return out, meta_out


def check(frames_blocks, rows_ll, rows_ml, rows_ofv, lits_list, OUTB=4096,
          SBd=None):
    """frames_blocks: build_records input; sequence rows + per-frame
    literal streams. Asserts kernel == reference."""
    if SBd is None:
        SBd = rows_ll.shape[1]
    meta, n_rec = ek.build_records(frames_blocks, SBd)
    exp, bads, litcs = ref_execute(
        meta, rows_ll, rows_ml, rows_ofv, lits_list, n_rec, len(lits_list)
    )
    out, meta_out = run_kernel(
        meta, rows_ll, rows_ml, rows_ofv, lits_list, OUTB, SBd
    )
    for f in range(len(lits_list)):
        total = meta_out[f, 0]
        assert total == len(exp[f]), (f, total, len(exp[f]))
        assert meta_out[f, 1] == bads[f], (f, meta_out[f, 1], bads[f])
        assert meta_out[f, 2] == litcs[f]
        got = bytes(out[f, :total])
        if got != exp[f]:
            d = next(i for i in range(total) if got[i] != exp[f][i])
            raise AssertionError(
                f"frame {f} diverges at byte {d}: "
                f"got {got[max(0,d-4):d+8]!r} exp {exp[f][max(0,d-4):d+8]!r}"
            )


def seq_rows(seqs_per_row, width=None):
    """seqs_per_row: list of lists of (ll, ml, ofv)."""
    width = width or max(max((len(r) for r in seqs_per_row), default=1), 8)
    n = len(seqs_per_row)
    ll = np.zeros((n, width), np.int32)
    ml = np.zeros((n, width), np.int32)
    ofv = np.zeros((n, width), np.int32)
    for i, r in enumerate(seqs_per_row):
        for j, (a, b, c) in enumerate(r):
            ll[i, j], ml[i, j], ofv[i, j] = a, b, c
    return ll, ml, ofv


def test_literals_only():
    lits = bytes(range(256)) * 2
    ll, ml, ofv = seq_rows([[]])
    check([[("lit", len(lits))]], ll, ml, ofv, [lits])


def test_rle_block():
    ll, ml, ofv = seq_rows([[]])
    check([[("rle", 300, 0x5A)]], ll, ml, ofv, [b""])


def test_simple_match():
    # 8 literals then a match of 5 at offset 8 (explicit: ofv = 8+3).
    lits = b"abcdefgh"
    ll, ml, ofv = seq_rows([[(8, 5, 11)]])
    check([[("seq", 0, 1, len(lits))]], ll, ml, ofv, [lits])


def test_overlapped_match_rle_style():
    # 1 literal then a 500-byte match at offset 1 (classic RLE expansion).
    lits = b"x"
    ll, ml, ofv = seq_rows([[(1, 500, 4)]])
    check([[("seq", 0, 1, 1)]], ll, ml, ofv, [lits])


def test_overlap_period_three():
    lits = b"abcRest"
    ll, ml, ofv = seq_rows([[(3, 400, 6), (0, 0, 0)]])
    # trailing literals "Rest" via budget 7
    check([[("seq", 0, 1, 7)]], ll, ml, ofv, [lits])


def test_cross_row_boundary_match():
    # Regression for the clamp bug: dest around byte 131, offset ~130,
    # chunk spans rows 1..2 and must read row 0 AND row 1 via t0.
    lits = bytes(range(131))
    ll, ml, ofv = seq_rows([[(131, 130, 133)]])  # off 130 = ofv 133
    check([[("seq", 0, 1, 131)]], ll, ml, ofv, [lits])


def test_repeat_offsets_full_matrix():
    # Exercise every rep form incl. the ll==0 shift and rep1-1.
    lits = b"0123456789" * 4
    seqs = [
        (10, 4, 7),   # explicit off 4      reps: 4,1,4->? start (1,4,8)->(4,1,4)... see ref
        (5, 3, 1),    # rep1 (ll>0)
        (5, 3, 2),    # rep2 (ll>0)
        (0, 3, 1),    # ll==0 -> rep2
        (0, 3, 3),    # ll==0 -> rep1 - 1
        (5, 3, 3),    # rep3 (ll>0)
        (5, 3, 8),    # explicit off 5
    ]
    ll, ml, ofv = seq_rows([seqs])
    check([[("seq", 0, len(seqs), 30)]], ll, ml, ofv, [lits])


def test_rep_carry_across_blocks():
    # Block 2 uses rep1 from block 1's history — the foreign-archive form
    # that used to need the host _fix_rep_carry pass.
    lits = b"abcdefghij" + b"KLMNO"
    b1 = [(10, 6, 10)]           # explicit off 7
    b2 = [(0, 4, 1), (5, 4, 2)]  # rep1 cross-block, then rep2
    ll, ml, ofv = seq_rows([b1, b2])
    check(
        [[("seq", 0, 1, 10), ("seq", 1, 2, 5)]],
        ll, ml, ofv, [lits],
    )


def test_rep_history_through_raw_and_rle_blocks():
    lits = b"0123456789" + b"rawblockbytes"
    b1 = [(10, 5, 9)]   # explicit off 6
    b3 = [(0, 4, 1)]    # rep1 — must still be 6 after lit + rle blocks
    ll, ml, ofv = seq_rows([b1, b3])
    check(
        [[("seq", 0, 1, 10), ("lit", 13), ("rle", 7, 0x41),
          ("seq", 1, 1, 0)]],
        ll, ml, ofv, [lits],
    )


def test_block_slicing_matches_unsliced():
    # A block of 20 sequences processed whole vs sliced at SBd=8 must agree.
    rng = np.random.default_rng(7)
    lits = bytes(rng.integers(0, 256, 400, dtype=np.uint8))
    seqs = []
    pos = 0
    for _ in range(20):
        ll = int(rng.integers(1, 20))
        pos += ll
        ml = int(rng.integers(3, 12))
        off = int(rng.integers(1, pos + 1))
        seqs.append((ll, ml, off + 3))
        pos += ml
    used = sum(s[0] for s in seqs)
    budget = used + 10
    ll, ml, ofv = seq_rows([seqs], width=32)
    meta_w, n_w = ek.build_records([[("seq", 0, 20, budget)]], 32)
    exp, bads, litcs = ref_execute(meta_w, ll, ml, ofv, [lits], n_w, 1)
    # Sliced: repack (1, 32) rows to (4, 8)
    ll8 = ll.reshape(4, 8)
    ml8 = ml.reshape(4, 8)
    ofv8 = ofv.reshape(4, 8)
    meta_s, _ = ek.build_records([[("seq", 0, 20, budget)]], 8)
    out, meta_out = run_kernel(meta_s, ll8, ml8, ofv8, [lits], 4096, 8)
    assert meta_out[0, 0] == len(exp[0])
    assert bytes(out[0, : meta_out[0, 0]]) == exp[0]
    assert meta_out[0, 1] == bads[0]


def test_bad_offset_flagged():
    lits = b"abc"
    ll, ml, ofv = seq_rows([[(3, 4, 103)]])  # off 100 > pos 3
    meta, n_rec = ek.build_records([[("seq", 0, 1, 3)]], 8)
    out, meta_out = run_kernel(meta, ll, ml, ofv, [lits], 4096, 8)
    assert meta_out[0, 1] == 1


def test_multi_frame_random():
    rng = np.random.default_rng(42)
    for trial in range(4):
        F = int(rng.integers(1, 4))
        rows = []
        frames = []
        lits_list = []
        for f in range(F):
            n_blocks = int(rng.integers(1, 4))
            blocks = []
            lit_stream = bytearray()
            pos = 0
            for b in range(n_blocks):
                kindpick = rng.integers(0, 10)
                if kindpick < 1:
                    n = int(rng.integers(1, 200))
                    byte = int(rng.integers(0, 256))
                    blocks.append(("rle", n, byte))
                    pos += n
                elif kindpick < 3:
                    n = int(rng.integers(0, 300))
                    chunk = rng.integers(0, 256, n, dtype=np.uint8)
                    blocks.append(("lit", n))
                    lit_stream += bytes(chunk)
                    pos += n
                else:
                    nseq = int(rng.integers(1, 30))
                    seqs = []
                    used = 0
                    reps = [1, 4, 8]
                    for _ in range(nseq):
                        ll = int(rng.integers(0, 24))
                        if pos + ll == 0:
                            ll = 1
                        chunk = rng.integers(0, 256, ll, dtype=np.uint8)
                        lit_stream += bytes(chunk)
                        used += ll
                        pos += ll
                        ml = int(rng.integers(3, 40))
                        # choose rep or explicit, keeping validity
                        r1, r2, r3 = reps
                        use_rep = rng.random() < 0.4
                        if use_rep:
                            ofv = int(rng.integers(1, 4))
                            ridx = ofv + (1 if ll == 0 else 0)
                            cand = {1: r1, 2: r2, 3: r3, 4: r1 - 1}[ridx]
                            if cand <= 0 or cand > pos:
                                use_rep = False
                        if not use_rep:
                            off = int(rng.integers(1, pos + 1))
                            ofv = off + 3
                            reps = [off, r1, r2]
                        else:
                            if ofv > 3:
                                pass
                            else:
                                if ridx == 1:
                                    off = r1
                                elif ridx == 2:
                                    off = r2
                                    reps = [r2, r1, r3]
                                elif ridx == 3:
                                    off = r3
                                    reps = [r3, r1, r2]
                                else:
                                    off = r1 - 1
                                    reps = [off, r1, r2]
                        seqs.append((ll, ml, ofv))
                        pos += ml
                    trail = int(rng.integers(0, 50))
                    chunk = rng.integers(0, 256, trail, dtype=np.uint8)
                    lit_stream += bytes(chunk)
                    pos += trail
                    blocks.append(("seq", len(rows), nseq, used + trail))
                    rows.append(seqs)
            frames.append(blocks)
            lits_list.append(bytes(lit_stream))
        if not rows:
            rows = [[]]
        ll, ml, ofv = seq_rows(rows, width=32)
        check(frames, ll, ml, ofv, lits_list, OUTB=8192, SBd=32)


@pytest.mark.parametrize("mode", ["serial", "fused"])
def test_serial_archive_path_own_and_foreign(monkeypatch, mode):
    """End-to-end: tpu_decompress_archive through the serial executor and
    the fused FSE+exec kernel (forced on CPU via env; interpret mode) —
    own archives, foreign libzstd frames with cross-block rep history,
    and corruption."""
    monkeypatch.setenv("ZEEKSTD_TPU_EXEC", mode)
    from zeekstd_tpu.tpu_archive import (
        tpu_compress_archive,
        tpu_decompress_archive,
        serial_fallback_count,
    )

    rng = np.random.default_rng(9)
    words = [
        bytes(rng.integers(97, 123, rng.integers(2, 9), dtype=np.uint8))
        for _ in range(60)
    ]
    data = b" ".join(words[rng.integers(0, 60)] for _ in range(3000))
    base = serial_fallback_count()
    blob, st = tpu_compress_archive(data, frame_size=16 << 10)
    assert tpu_decompress_archive(blob, st) == data
    assert serial_fallback_count() == base

    # Foreign frame: libzstd emits cross-block repeat history (the form
    # that used to hit the host _fix_rep_carry loop).
    from .oracle import zstd_compress

    frame = zstd_compress(data, 6)
    assert tpu_decompress_archive(frame) == data
    assert serial_fallback_count() == base

    # Corruption: truncation must raise (a flipped payload byte in a
    # checksum-less frame may legitimately decode to different bytes —
    # libzstd behaves the same; detection needs the XXH64 checksum, which
    # the CLI enables by default).
    import zeekstd_tpu.errors as errors

    with pytest.raises(Exception):
        tpu_decompress_archive(frame[: len(frame) - 7])


def test_match_kernel_encode_roundtrip(monkeypatch):
    """Opt-in serial match-kernel parse (interpret on CPU): the encoded
    archive round-trips and libzstd decodes it; ratio stays within 5% of
    the XLA parse (the slice-clamp RAW demotion regression guard)."""
    monkeypatch.setenv("ZEEKSTD_TPU_EXEC", "fused")
    from zeekstd_tpu.tpu_archive import tpu_compress_archive, tpu_decompress_archive
    from .oracle import zstd_decompress

    rng = np.random.default_rng(5)
    words = [
        bytes(rng.integers(97, 123, rng.integers(2, 9), dtype=np.uint8))
        for _ in range(200)
    ]
    data = b" ".join(words[rng.integers(0, 200)] for _ in range(9000))[:65536 + 9999]

    monkeypatch.setenv("ZEEKSTD_TPU_MATCH", "xla")
    blob_x, _ = tpu_compress_archive(data, frame_size=64 << 10, level=1)
    monkeypatch.setenv("ZEEKSTD_TPU_MATCH", "kernel")
    blob_k, st = tpu_compress_archive(data, frame_size=64 << 10, level=1)
    assert tpu_decompress_archive(blob_k, st) == data
    parts = [
        zstd_decompress(
            blob_k[st.frame_start_comp(i) : st.frame_end_comp(i)],
            st.frame_size_decomp(i),
        )
        for i in range(st.num_frames)
    ]
    assert b"".join(parts) == data
    assert len(blob_k) <= len(blob_x) * 1.05, (len(blob_k), len(blob_x))


def test_ring_decoder_roundtrip(monkeypatch):
    """All-scalar ring decoder (interpret mode): kernel-parsed archives
    (declared window <= 512 KiB) decode bit-exactly through the SMEM
    output ring, including RLE blocks, short overlapping offsets and
    cross-block repeat history."""
    monkeypatch.setenv("ZEEKSTD_TPU_MATCH", "kernel")
    monkeypatch.setenv("ZEEKSTD_TPU_EXEC", "fused")
    monkeypatch.setenv("ZEEKSTD_TPU_RING", "1")
    from zeekstd_tpu.tpu_archive import (
        tpu_compress_archive, tpu_decompress_archive,
    )

    rng = np.random.default_rng(11)
    words = [
        bytes(rng.integers(97, 123, rng.integers(2, 9), dtype=np.uint8))
        for _ in range(150)
    ]
    data = (
        b" ".join(words[rng.integers(0, 150)] for _ in range(5000))
        + b"A" * 5000                      # RLE block material
        + bytes(rng.integers(0, 256, 40000, dtype=np.uint8))  # raw-ish
        + b"abcabcabc" * 2000              # off-3 overlapping copies
    )[: 96 << 10]
    blob, st = tpu_compress_archive(data, frame_size=64 << 10, level=1)
    assert tpu_decompress_archive(blob, st) == data
    # And a foreign (libzstd) archive with a small window rides the ring
    # decoder too — exercises real cross-block rep history.
    from .oracle import zstd_compress

    foreign = zstd_compress(data[: 48 << 10], level=3)
    out = tpu_decompress_archive(foreign)
    assert out == data[: 48 << 10]
