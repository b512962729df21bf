"""Fused serial decoder kernel: FSE sequence decode + LZ execution.

Evolution of ops/exec_kernel.py (which executes pre-decoded sequence
rows): here each KIND_SEQ record reads its block's FSE *bitstream*
directly — the scalar core walks the backward bitstream, maintains the
three FSE states, resolves repeat offsets in-order with exact libzstd
semantics, and executes every sequence's copies immediately. This
removes the separate vmapped FSE dispatch (~58 ms/MiB of scan-decode on
this chip) and the (B, seq_bound) intermediate arrays entirely.

Bitstream semantics mirror the proven vector decoder
(ops/entropy.py::fse_decode_sequences, validated against libzstd):
initial states read ll, of, ml; per sequence the extra bits read of, ml,
ll; state updates ll, ml, of, skipped for the block's final sequence; a
stream that does not end with exactly zero remaining bits marks the
frame bad (libzstd's corruption_detected analog). Reference hot loop:
the sequence decode inside decompress_stream (lib/src/decode.rs:242-256).

Inputs per KIND_SEQ record (scalar-prefetched meta row):
- the block's bitstream words, staged as an SMEM block of the (Bp, WB)
  uint32 word table (index-mapped by meta)
- three packed decode-table rows of the deduped (Tp, 512) pool
  (symbol | nb_bits << 8 | baseline << 16), index-mapped by meta —
  Repeat_Mode blocks share rows
- ll/ml code base+bits constants (4, 64) via scalar prefetch

Copy machinery, literal-window staging, front-pad alignment, and the
hostile-input clamps are identical to exec_kernel.py (see its module
docstring for the geometry).
"""

from __future__ import annotations

import numpy as np

KIND_SEQ = 0
KIND_LIT = 1
KIND_RLE = 2
KIND_NOP = 3

F_FRAME_START = 1
F_FRAME_END = 2

M_FRAME = 0
M_KIND = 1
M_WROW = 2
M_NSEQ = 3
M_LITN = 4  # KIND_LIT/KIND_RLE: length; KIND_SEQ: block literal budget
M_FLAGS = 5
M_RLEBYTE = 6
M_TLL = 7
M_TOF = 8
M_TML = 9
M_LOGS = 10  # ll_log | of_log << 5 | ml_log << 10
M_STARTBIT = 11
META_COLS = 16

PADR = 8
PADB = PADR * 128

_fns = {}


def _build(WB: int, LITB: int, OUTB: int, NRECP: int, F: int, LROWS: int,
           interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert OUTB % 4096 == 0, "OUTB must be a multiple of 4096"
    assert LITB % 128 == 0 and WB % 8 == 0
    ORWS = OUTB // 128
    LRWS = LITB // 128 + 1
    assert LROWS >= LRWS
    F8 = max(8, F)
    WB8 = WB // 8

    shr = jax.lax.shift_right_logical
    shl = jax.lax.shift_left

    def kernel(consts_ref, meta_ref, words_ref, tll_ref, tof_ref, tml_ref,
               lits_hbm, out_hbm, meta_out, outbuf, u8buf, litbuf, state,
               dma_sem, out_sem):
        i = pl.program_id(0)
        frame = meta_ref[i, M_FRAME]
        kind = meta_ref[i, M_KIND]
        nseq = meta_ref[i, M_NSEQ]
        litn = meta_ref[i, M_LITN]
        flags = meta_ref[i, M_FLAGS]

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        gidx = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128 + lane

        @pl.when(flags & F_FRAME_START != 0)
        def _():
            state[0] = 0   # output byte cursor
            state[1] = 1   # rep1
            state[2] = 4   # rep2
            state[3] = 8   # rep3
            state[4] = 0   # bad flag
            state[5] = 0   # literal stream cursor
            state[7] = -1  # staged litbuf window row

        litcur0 = state[5]
        lit_row0 = jnp.minimum(litcur0 // 128, LROWS - LRWS)
        lit_rebase = lit_row0 * 128 - PADB
        lit_lim = lit_row0 * 128 + LITB + 128

        @pl.when(((kind == KIND_SEQ) | (kind == KIND_LIT))
                 & (state[7] != lit_row0))
        def _():
            state[7] = lit_row0
            dma = pltpu.make_async_copy(
                lits_hbm.at[frame, pl.ds(lit_row0, LRWS), :],
                litbuf.at[pl.ds(PADR, LRWS), :],
                dma_sem,
            )
            dma.start()
            dma.wait()

        def copy_span(src_is_lit, sp, dp, L, grow_off):
            def cond(carry):
                done, _ = carry
                return done < L

            def body(carry):
                done, _ = carry
                dd = dp + done
                c = jnp.minimum(L - done, 1024 - (dd & 127))
                go = jnp.maximum(grow_off, 1)
                P = go * (1 + done // go)
                c = jnp.where(grow_off > 0, jnp.minimum(c, P), c)
                ss = jnp.where(grow_off > 0, dd - P, sp + done)
                delta = ss - dd
                k = jax.lax.rem(jax.lax.rem(delta, 128) + 128, 128)
                a = (delta - k) // 128
                pr0 = dd // 128
                sr = pr0 + a

                def read2(ref):
                    return ref[pl.ds(sr, 8), :], ref[pl.ds(sr + 1, 8), :]

                if src_is_lit:
                    t0, t1 = read2(litbuf)
                else:
                    t0, t1 = read2(outbuf)
                pre = jnp.where(lane < k, t1, t0)
                sh = jnp.where(k == 0, 0, 128 - k)
                rolled = pltpu.roll(pre, sh, 1)
                cur = outbuf[pl.ds(pr0, 8), :]
                gpos = pr0 * 128 + gidx
                mask = (gpos >= dd) & (gpos < dd + c)
                outbuf[pl.ds(pr0, 8), :] = jnp.where(mask, rolled, cur)
                return done + c, 0

            jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

        def fill_span(dp, L, val):
            tile = jnp.full((8, 128), val, jnp.int32)

            def cond(carry):
                done, _ = carry
                return done < L

            def body(carry):
                done, _ = carry
                dd = dp + done
                c = jnp.minimum(L - done, 1024 - (dd & 127))
                pr0 = dd // 128
                cur = outbuf[pl.ds(pr0, 8), :]
                gpos = pr0 * 128 + gidx
                mask = (gpos >= dd) & (gpos < dd + c)
                outbuf[pl.ds(pr0, 8), :] = jnp.where(mask, tile, cur)
                return done + c, 0

            jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

        def read_bits(rem, n):
            """n bits ending at bit ``rem`` of the backward stream
            (n in [0, 31]; mirrors entropy.py::read_at)."""
            lo = rem - n
            w = jnp.clip(lo >> 5, 0, WB - 2)
            sh = lo & 31
            w0 = words_ref[0, w // WB8, w % WB8]
            w1 = words_ref[0, (w + 1) // WB8, (w + 1) % WB8]
            hi = jnp.where(sh == 0, 0, shl(w1, (32 - sh) & 31))
            both = shr(w0, sh) | hi
            mask = shl(jnp.int32(1), jnp.clip(n, 0, 31)) - 1
            return jnp.where(n <= 0, 0, both & mask)

        @pl.when(kind == KIND_SEQ)
        def _():
            logs = meta_ref[i, M_LOGS]
            ll_log = logs & 31
            of_log = (logs >> 5) & 31
            ml_log = (logs >> 10) & 31
            rem0 = meta_ref[i, M_STARTBIT]
            ll_s0 = read_bits(rem0, ll_log)
            rem0 = rem0 - ll_log
            of_s0 = read_bits(rem0, of_log)
            rem0 = rem0 - of_log
            ml_s0 = read_bits(rem0, ml_log)
            rem0 = rem0 - ml_log

            def seq_body(j, carry):
                (pos, litcur, r1, r2, r3, bad,
                 ll_s, of_s, ml_s, rem) = carry
                of_e = tof_ref[0, of_s // 64, of_s % 64]
                ml_e = tml_ref[0, ml_s // 64, ml_s % 64]
                ll_e = tll_ref[0, ll_s // 64, ll_s % 64]

                of_code = of_e & 0xFF
                ofv = shl(jnp.int32(1), jnp.clip(of_code, 0, 31)) + read_bits(
                    rem, of_code
                )
                rem = rem - of_code
                ml_code = ml_e & 0xFF
                mlb = consts_ref[3, ml_code]
                ml = consts_ref[2, ml_code] + read_bits(rem, mlb)
                rem = rem - mlb
                ll_code = ll_e & 0xFF
                llb = consts_ref[1, ll_code]
                ll = consts_ref[0, ll_code] + read_bits(rem, llb)
                rem = rem - llb

                # Repeat-offset resolution (RFC 8878 3.1.1.3.2.1.1).
                ridx = jnp.where(ofv > 3, 0, ofv + jnp.where(ll == 0, 1, 0))
                off = jnp.where(ofv > 3, ofv - 3,
                      jnp.where(ridx == 1, r1,
                      jnp.where(ridx == 2, r2,
                      jnp.where(ridx == 3, r3, r1 - 1))))
                moved = (ofv > 3) | (ridx != 1)
                nr3 = jnp.where(ridx == 2, r3, jnp.where(moved, r2, r3))
                nr2 = jnp.where(moved, r1, r2)
                nr1 = jnp.where(moved, off, r1)

                # FSE state updates (skipped after the block's last seq).
                upd = j + 1 < nseq
                llnb = (ll_e >> 8) & 0xFF
                ll_s2 = (ll_e >> 16) + read_bits(rem, llnb)
                rem = rem - jnp.where(upd, llnb, 0)
                mlnb = (ml_e >> 8) & 0xFF
                ml_s2 = (ml_e >> 16) + read_bits(rem, mlnb)
                rem = rem - jnp.where(upd, mlnb, 0)
                ofnb = (of_e >> 8) & 0xFF
                of_s2 = (of_e >> 16) + read_bits(rem, ofnb)
                rem = rem - jnp.where(upd, ofnb, 0)
                ll_s = jnp.where(upd, ll_s2, ll_s)
                ml_s = jnp.where(upd, ml_s2, ml_s)
                of_s = jnp.where(upd, of_s2, of_s)

                # Hostile-input clamps (see exec_kernel.py).
                ll_w = jnp.minimum(
                    jnp.minimum(ll, OUTB - pos),
                    jnp.maximum(lit_lim - litcur, 0),
                )
                bad = bad | jnp.where(ll_w != ll, 1, 0)

                @pl.when(ll_w > 0)
                def _():
                    copy_span(True, litcur - lit_rebase, pos + PADB, ll_w, 0)

                mpos = pos + ll_w
                ml_w = jnp.minimum(ml, OUTB - mpos)
                bad = bad | jnp.where(
                    ((ml > 0) & ((off <= 0) | (off > mpos))) | (ml_w != ml),
                    1, 0,
                )
                safe_off = jnp.clip(off, 1, jnp.maximum(mpos, 1))

                @pl.when(ml_w > 0)
                def _():
                    copy_span(False, mpos - safe_off + PADB, mpos + PADB,
                              ml_w, safe_off)

                return (mpos + ml_w, litcur + ll_w, nr1, nr2, nr3, bad,
                        ll_s, of_s, ml_s, rem)

            (pos, litcur, r1, r2, r3, bad, _l, _o, _m, rem) = (
                jax.lax.fori_loop(
                    0, nseq, seq_body,
                    (state[0], litcur0, state[1], state[2], state[3],
                     state[4], ll_s0, of_s0, ml_s0, rem0),
                )
            )
            state[1] = r1
            state[2] = r2
            state[3] = r3
            # The stream must land on exactly zero remaining bits.
            bad = bad | jnp.where(rem != 0, 1, 0)

            trail = litn - (litcur - litcur0)
            bad = bad | jnp.where(trail < 0, 1, 0)
            trail_c = jnp.minimum(
                jnp.minimum(jnp.maximum(trail, 0), OUTB - pos),
                jnp.maximum(lit_lim - litcur, 0),
            )
            bad = bad | jnp.where(trail_c != jnp.maximum(trail, 0), 1, 0)

            @pl.when(trail_c > 0)
            def _():
                copy_span(True, litcur - lit_rebase, pos + PADB, trail_c, 0)

            state[0] = pos + trail_c
            state[5] = litcur + trail_c
            state[4] = bad

        @pl.when(kind == KIND_LIT)
        def _():
            pos = state[0]
            litn_w = jnp.minimum(
                jnp.minimum(litn, OUTB - pos),
                jnp.maximum(lit_lim - litcur0, 0),
            )
            state[4] = state[4] | jnp.where(litn_w != litn, 1, 0)

            @pl.when(litn_w > 0)
            def _():
                copy_span(True, litcur0 - lit_rebase, pos + PADB, litn_w, 0)

            state[0] = pos + litn_w
            state[5] = litcur0 + litn_w

        @pl.when(kind == KIND_RLE)
        def _():
            pos = state[0]
            litn_w = jnp.minimum(litn, OUTB - pos)
            state[4] = state[4] | jnp.where(litn_w != litn, 1, 0)
            fill_span(pos + PADB, litn_w, meta_ref[i, M_RLEBYTE])
            state[0] = pos + litn_w

        @pl.when(flags & F_FRAME_END != 0)
        def _():
            total = state[0]

            def cast_body(r, _):
                u8buf[pl.ds(r * 32, 32), :] = outbuf[
                    pl.ds(PADR + r * 32, 32), :
                ].astype(jnp.uint8)
                return 0

            jax.lax.fori_loop(0, ORWS // 32, cast_body, 0)
            dma = pltpu.make_async_copy(u8buf, out_hbm.at[frame], out_sem)
            dma.start()
            dma.wait()
            row = jnp.zeros((1, 128), jnp.int32)
            li = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            row = jnp.where(li == 0, total, row)
            row = jnp.where(li == 1, state[4], row)
            row = jnp.where(li == 2, state[5], row)
            meta_out[pl.ds(frame, 1), :] = row

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NRECP,),
        in_specs=[
            pl.BlockSpec((1, 8, WB8), lambda i, c, m: (m[i, M_WROW], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 64), lambda i, c, m: (m[i, M_TLL], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 64), lambda i, c, m: (m[i, M_TOF], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 64), lambda i, c, m: (m[i, M_TML], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # lits (F, LROWS, 128) i32
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # out (F, ORWS, 128) u8
            pl.BlockSpec((F8, 128), lambda i, c, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((PADR + ORWS + 8, 128), jnp.int32),
            pltpu.VMEM((ORWS, 128), jnp.uint8),
            pltpu.VMEM((PADR + LRWS + 8, 128), jnp.int32),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    def call(consts, meta, words, tables, lits):
        nw = words.shape[0]
        tp = tables.shape[0]
        words3 = words.reshape(nw, 8, WB8)
        tab3 = tables.reshape(tp, 8, 64)
        out, meta_out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((F, ORWS, 128), jnp.uint8),
                jax.ShapeDtypeStruct((F8, 128), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
            ),
            interpret=interpret,
        )(consts, meta, words3, tab3, tab3, tab3, lits)
        return out, meta_out[:F]

    return jax.jit(call)


def get_decode_kernel(WB: int, LITB: int, OUTB: int, NRECP: int, F: int,
                      LROWS: int, interpret: bool = False):
    key = (WB, LITB, OUTB, NRECP, F, LROWS, interpret)
    if key not in _fns:
        _fns[key] = _build(*key)
    return _fns[key]


def make_consts():
    """(4, 64) int32: LL_BASE, LL_BITS, ML_BASE, ML_BITS padded."""
    from ..codec import sequences as seq_mod

    consts = np.zeros((4, 64), np.int32)
    consts[0, : len(seq_mod.LL_BASE)] = seq_mod.LL_BASE
    consts[1, : len(seq_mod.LL_BITS)] = seq_mod.LL_BITS
    consts[2, : len(seq_mod.ML_BASE)] = seq_mod.ML_BASE
    consts[3, : len(seq_mod.ML_BITS)] = seq_mod.ML_BITS
    return consts


def build_records(frames):
    """``frames``: per output frame, a list of block entries:
      ("seq", wrow, nseq, lit_budget, tll, tof, tml, logs, startbit)
      ("lit", litlen)
      ("rle", count, byte)
    Returns (int32[NRECP, META_COLS], record count)."""
    recs = []
    for f, blocks in enumerate(frames):
        if not blocks:
            blocks = [("lit", 0)]
        n_blocks = len(blocks)
        for bi, b in enumerate(blocks):
            flags = (F_FRAME_START if bi == 0 else 0) | (
                F_FRAME_END if bi == n_blocks - 1 else 0
            )
            row = [f, 0, 0, 0, 0, flags, 0] + [0] * (META_COLS - 7)
            if b[0] == "seq":
                (_, wrow, nseq, budget, tll, tof, tml, logs, startbit) = b
                row[M_KIND] = KIND_SEQ
                row[M_WROW] = wrow
                row[M_NSEQ] = nseq
                row[M_LITN] = budget
                row[M_TLL] = tll
                row[M_TOF] = tof
                row[M_TML] = tml
                row[M_LOGS] = logs
                row[M_STARTBIT] = startbit
            elif b[0] == "lit":
                row[M_KIND] = KIND_LIT
                row[M_LITN] = b[1]
            else:
                row[M_KIND] = KIND_RLE
                row[M_LITN] = b[1]
                row[M_RLEBYTE] = b[2]
            recs.append(row)
    n = len(recs)
    nrecp = 1 << max((n - 1).bit_length(), 3)
    out = np.zeros((nrecp, META_COLS), np.int32)
    if recs:
        out[:n] = np.asarray(recs, np.int32)
    out[n:, M_KIND] = KIND_NOP
    return out, n
