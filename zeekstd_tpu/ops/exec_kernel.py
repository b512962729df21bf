"""Serial Pallas sequence executor: one kernel decodes whole frames.

The pointer-doubling executor (ops/seq_exec.py) is fully parallel but pays
~7.5 ns per gathered element on this chip's XLA random gather — and it
needs 8+ full-size passes, a per-byte literal gather, and a host-side
sequential pass for cross-block repeat offsets. This kernel takes the
opposite, hardware-shaped route: LZ77 sequence execution is ~20 output
bytes per sequence, so a *serial* scalar loop whose body is a handful of
VPU tile ops beats any per-byte formulation — the TPU scalar core drives
one (8, 128) dynamic-slice read + lane roll + masked store per copied
chunk, i.e. a few ns/byte instead of ~60 ns/byte for 8 gather passes.

Shape of the computation (reference behavior: the sequence-execution loop
libzstd runs under decompress_stream, lib/src/decode.rs:242-256):

- grid = one step per *record* (a real zstd block, a raw/RLE block, a
  synthetic literal run, or a bounded-width slice of a block's sequences),
  in frame-major order.
- per-record sequence rows (ll, ml, raw offset value) stream into SMEM via
  the scalar-prefetched record table; the scalar core reads them one
  sequence at a time.
- repeat offsets resolve EXACTLY like libzstd (rep1/2/3 history threaded
  across blocks in SMEM scratch) — foreign archives take this same path,
  no host fallback (round-2 verdict item: _fix_rep_carry's per-sequence
  Python loop is gone from the fast path).
- the frame's decoded bytes live in a VMEM scratch (one int32 lane per
  byte); literal windows are DMA'd from the frame literal stream in HBM
  at the threaded literal cursor.
- at frame end the scratch is cast to uint8 and DMA'd to the output row,
  and (total, bad-flag, literals-consumed) land in a per-frame meta row.

Copy machinery: a span copy of L bytes with arbitrary source/destination
byte alignment is a chunked loop; each chunk reads the two covering
(8, 128) source tiles, selects across the lane-wrap boundary, applies ONE
dynamic lane roll, and masked-stores into the destination tile. Matches
with offset < length copy from the largest whole-period distance P <= off
+ copied (the overlapped match is periodic with period off), so RLE-style
runs cost O(log) iterations.

Alignment: both scratch buffers carry an 8-row (1024-byte) front pad and
every byte position is rebased by PADB. The straddle read of two 8-row
source tiles can start one row before the source's first row; the pad
keeps that read in-bounds WITHOUT clamping — a clamp would shift all
eight rows of the low tile and corrupt multi-row chunks (the round-3
"byte ~131" bug).
"""

from __future__ import annotations

import numpy as np

# Record kinds
KIND_SEQ = 0  # sequences slice of a compressed block (+ trail at block end)
KIND_LIT = 1  # pure literal run (raw block / sequence-less block)
KIND_RLE = 2  # RLE block: one byte repeated
KIND_NOP = 3  # padding

# Flags
F_FRAME_START = 1
F_FRAME_END = 2
F_BLOCK_START = 4
F_BLOCK_END = 8

# meta columns
M_FRAME = 0
M_KIND = 1
M_ROW = 2
M_NSEQ = 3
M_LITN = 4  # KIND_LIT/KIND_RLE: length; KIND_SEQ: block literal budget
M_FLAGS = 5
M_RLEBYTE = 6
META_COLS = 8

PADR = 8  # front-pad rows on both scratch buffers
PADB = PADR * 128

_fns = {}


def _build(SBd: int, LITB: int, OUTB: int, NRECP: int, F: int, LROWS: int,
           interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert OUTB % 4096 == 0, "OUTB must be a multiple of 4096"
    assert LITB % 128 == 0, "LITB must be a multiple of 128"
    assert SBd % 8 == 0, "SBd must be a multiple of 8"
    # SMEM blocks need 8-divisible sublanes: rows are staged as
    # (1, 8, SBd//8) blocks of an (NROWS, 8, SBd//8) view.
    SBd8 = SBd // 8
    ORWS = OUTB // 128
    LRWS = LITB // 128 + 1  # staged rows per record (window may straddle)
    # Host contract: LROWS leaves the DMA in-bounds at the last cursor row.
    assert LROWS >= LRWS, "lits stream must be padded to >= LRWS rows"
    F8 = max(8, F)

    def kernel(meta_ref, lls_ref, mls_ref, ofv_ref, lits_hbm, out_hbm,
               meta_out, outbuf, u8buf, litbuf, state, dma_sem, out_sem):
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
            state[6] = 0   # literal cursor at block start
            state[7] = -1  # staged litbuf window row (cache key)

        @pl.when(flags & F_BLOCK_START != 0)
        def _():
            state[6] = state[5]

        # Stage this record's literal window: rows [row0, row0+LRWS) of the
        # frame literal stream land at litbuf rows [PADR, PADR+LRWS); byte
        # q of the stream maps to litbuf byte (q - row0*128) + PADB.
        litcur0 = state[5]
        lit_row0 = litcur0 // 128
        lit_rebase = lit_row0 * 128 - PADB

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
            """Copy L bytes to PADDED output byte dp from PADDED byte sp of
            litbuf (src_is_lit) or outbuf. grow_off > 0 enables the
            overlapped-match periodic copy rule."""

            def cond(carry):
                done, _ = carry
                return done < L

            def body(carry):
                done, _ = carry
                dd = dp + done
                c = jnp.minimum(L - done, 1024 - (dd & 127))
                # Overlapped matches (offset < length) are periodic with
                # period grow_off; read at the largest whole-period
                # distance P <= grow_off + done so the chunk never reads
                # bytes it writes. P doubles as done grows: O(log) chunks
                # for RLE-style runs.
                go = jnp.maximum(grow_off, 1)
                P = go * (1 + done // go)
                c = jnp.where(grow_off > 0, jnp.minimum(c, P), c)
                ss = jnp.where(grow_off > 0, dd - P, sp + done)
                delta = ss - dd
                k = jax.lax.rem(jax.lax.rem(delta, 128) + 128, 128)
                a = (delta - k) // 128
                pr0 = dd // 128
                sr = pr0 + a  # >= 0: sources are >= PADB - 128 = 7 rows

                def read2(ref):
                    t0 = ref[pl.ds(sr, 8), :]
                    t1 = ref[pl.ds(sr + 1, 8), :]
                    return t0, t1

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

        @pl.when(kind == KIND_SEQ)
        def _():
            def seq_body(j, carry):
                pos, litcur, r1, r2, r3, bad = carry
                jh, jl = j // SBd8, j % SBd8
                ll = lls_ref[0, jh, jl]
                ml = mls_ref[0, jh, jl]
                ofv = ofv_ref[0, jh, jl]

                # Repeat-offset resolution, libzstd semantics
                # (RFC 8878 3.1.1.3.2.1.1): index shifts by one when ll==0.
                ridx = jnp.where(ofv > 3, 0, ofv + jnp.where(ll == 0, 1, 0))
                off_new = ofv - 3
                off = jnp.where(ofv > 3, off_new,
                      jnp.where(ridx == 1, r1,
                      jnp.where(ridx == 2, r2,
                      jnp.where(ridx == 3, r3, r1 - 1))))
                moved = (ofv > 3) | (ridx != 1)
                nr3 = jnp.where(ridx == 2, r3, jnp.where(moved, r2, r3))
                nr2 = jnp.where(moved, r1, r2)
                nr1 = jnp.where(moved, off, r1)

                @pl.when(ll > 0)
                def _():
                    copy_span(True, litcur - lit_rebase, pos + PADB, ll, 0)

                mpos = pos + ll
                bad = bad | jnp.where(
                    (ml > 0) & ((off <= 0) | (off > mpos)), 1, 0
                )
                safe_off = jnp.clip(off, 1, jnp.maximum(mpos, 1))

                @pl.when(ml > 0)
                def _():
                    copy_span(False, mpos - safe_off + PADB, mpos + PADB,
                              ml, safe_off)

                return (mpos + ml, litcur + ll, nr1, nr2, nr3, bad)

            (pos, litcur, r1, r2, r3, bad) = jax.lax.fori_loop(
                0, nseq, seq_body,
                (state[0], litcur0, state[1], state[2], state[3], state[4]),
            )
            state[1] = r1
            state[2] = r2
            state[3] = r3

            # Trailing literals at block end: whatever the block's literal
            # budget (litn) leaves after every sequence slice consumed.
            is_end = flags & F_BLOCK_END != 0
            trail = jnp.where(is_end, litn - (litcur - state[6]), 0)
            bad = bad | jnp.where(trail < 0, 1, 0)
            trail_c = jnp.maximum(trail, 0)

            @pl.when(trail_c > 0)
            def _():
                copy_span(True, litcur - lit_rebase, pos + PADB, trail_c, 0)

            state[0] = pos + trail_c
            state[5] = litcur + trail_c
            state[4] = bad

        @pl.when(kind == KIND_LIT)
        def _():
            pos = state[0]

            @pl.when(litn > 0)
            def _():
                copy_span(True, litcur0 - lit_rebase, pos + PADB, litn, 0)

            state[0] = pos + litn
            state[5] = litcur0 + litn

        @pl.when(kind == KIND_RLE)
        def _():
            pos = state[0]
            fill_span(pos + PADB, litn, meta_ref[i, M_RLEBYTE])
            state[0] = pos + litn

        @pl.when(flags & F_FRAME_END != 0)
        def _():
            total = state[0]

            # Cast the decoded frame to bytes and ship it out.
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
        num_scalar_prefetch=1,
        grid=(NRECP,),
        in_specs=[
            pl.BlockSpec((1, 8, SBd8), lambda i, m: (m[i, M_ROW], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, SBd8), lambda i, m: (m[i, M_ROW], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, SBd8), lambda i, m: (m[i, M_ROW], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # lits (F, LROWS, 128) i32
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # out (F, ORWS, 128) u8
            pl.BlockSpec((F8, 128), lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM),  # meta_out
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

    def call(meta, lls_b, mls_b, ofvs_b, lits):
        nrows = lls_b.shape[0]
        lls_b = lls_b.reshape(nrows, 8, SBd8)
        mls_b = mls_b.reshape(nrows, 8, SBd8)
        ofvs_b = ofvs_b.reshape(nrows, 8, SBd8)
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
        )(meta, lls_b, mls_b, ofvs_b, lits)
        return out, meta_out[:F]

    return jax.jit(call)


def get_exec_kernel(SBd: int, LITB: int, OUTB: int, NRECP: int, F: int,
                    LROWS: int, interpret: bool = False):
    key = (SBd, LITB, OUTB, NRECP, F, LROWS, interpret)
    if key not in _fns:
        _fns[key] = _build(*key)
    return _fns[key]


def build_records(frames, sbd: int):
    """Host-side record table builder.

    ``frames`` is a list (one per output frame) of per-block entries:
      ("seq", row, nseq, lit_budget)  — row indexes the (NROWS, sbd)
        sequence arrays; blocks wider than sbd span consecutive rows
      ("lit", litlen)
      ("rle", count, byte)
    Returns int32[NRECP, META_COLS] (padded) and the record count.
    """
    recs = []
    for f, blocks in enumerate(frames):
        if not blocks:
            blocks = [("lit", 0)]
        n_blocks = len(blocks)
        for bi, b in enumerate(blocks):
            fflags = (F_FRAME_START if bi == 0 else 0) | (
                F_FRAME_END if bi == n_blocks - 1 else 0
            )
            if b[0] == "seq":
                _, row, nseq, budget = b
                n_slices = max(1, -(-nseq // sbd))
                for s in range(n_slices):
                    ns = min(sbd, nseq - s * sbd)
                    flags = F_BLOCK_START if s == 0 else 0
                    if s == n_slices - 1:
                        flags |= F_BLOCK_END
                    rec_flags = flags
                    if s == 0:
                        rec_flags |= fflags & F_FRAME_START
                    if s == n_slices - 1:
                        rec_flags |= fflags & F_FRAME_END
                    recs.append([f, KIND_SEQ, row + s, ns, budget,
                                 rec_flags, 0, 0])
            elif b[0] == "lit":
                _, litlen = b
                recs.append([f, KIND_LIT, 0, 0, litlen,
                             fflags | F_BLOCK_START | F_BLOCK_END, 0, 0])
            else:
                _, count, byte = b
                recs.append([f, KIND_RLE, 0, 0, count,
                             fflags | F_BLOCK_START | F_BLOCK_END, byte, 0])
    n = len(recs)
    nrecp = 1 << max((n - 1).bit_length(), 3)
    out = np.zeros((nrecp, META_COLS), np.int32)
    if recs:
        out[:n] = np.asarray(recs, np.int32)
    out[n:, M_KIND] = KIND_NOP
    return out, n
