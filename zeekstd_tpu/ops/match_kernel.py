"""Serial Pallas LZ77 match finder: greedy hash matching per block.

The XLA parse (ops/match_tpu.py) discovers candidates with sorts and
strip gathers — ~200 ms/MiB of random-gather time on this chip. This
kernel is the hardware-shaped alternative: one grid step per 32 KiB
block, the scalar core walks positions with a VMEM-resident frame for
match extension and SMEM-resident hash tables for candidate discovery
(the zstd level-1 fast strategy; reference analog: the match loop under
compress_stream2, lib/src/encode.rs:340-346).

Per position: hash the next 4 bytes (read from the block's words staged
in SMEM), probe a single-entry hash table that stores BOTH the position
and the hashed word — equal words guarantee a >=4-byte match, so no
memory read is needed to verify a candidate. On a hit, the match
extends via vector tile compares against the frame staged in VMEM
(two straddle reads + lane roll + first-mismatch reduction, the same
geometry as the decode kernels' copy_span), the literal run copies into
the frame's literal stream, and the position jumps over the match.
Misses advance with zstd's literal-run acceleration.

Outputs per block record: SMEM rows of (ll, ml, offset) plus a meta row
(nseq, match-byte sum); per frame, the literal stream (uint8) lands in
HBM. Sequences are block-contained (matches clamp at the block end) and
positions are frame-global (the window is the whole frame), matching
the XLA parse's framing so the downstream stats/FSE/Huffman/assembly
pipeline is unchanged.

Hash-table validity across frames uses position tagging (entries store
frame*FR + pos; entries from earlier frames read as invalid), so the
tables are zeroed once at grid step 0 only.
"""

from __future__ import annotations

import numpy as np

M_FRAME = 0
M_WROW = 1
M_BS = 2
M_BLEN = 3
M_FLAGS = 4
META_COLS = 8

F_FRAME_START = 1
F_FRAME_END = 2

PADR = 8
PADB = PADR * 128

HB = 14  # hash bits; table = 2^HB positions + 2^HB words in SMEM

_fns = {}


def _build(BLK: int, FR: int, SBd: int, NRECP: int, F: int,
           interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert FR % 4096 == 0 and BLK % 512 == 0 and SBd % 8 == 0
    FRROWS = FR // 128
    BLKW = BLK // 4
    BLKW8 = BLKW // 8
    SBd8 = SBd // 8
    NREC8 = max(8, NRECP)
    HSIZE = 1 << HB

    shr = jax.lax.shift_right_logical
    shl = jax.lax.shift_left
    MUL = np.int32(2654435761 - (1 << 32))  # Knuth multiplier (wraps)

    def kernel(meta_ref, words_ref, frames_hbm, ll_out, ml_out, off_out,
               lits_hbm, meta_out, framebuf, litbuf, u8buf, ht_pos, ht_word,
               state, dma_sem, out_sem):
        i = pl.program_id(0)
        frame = meta_ref[i, M_FRAME]
        bs = meta_ref[i, M_BS]
        blen = meta_ref[i, M_BLEN]
        flags = meta_ref[i, M_FLAGS]
        fbase = frame * FR

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        gidx = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128 + lane

        @pl.when(i == 0)
        def _():
            def z(h, _):
                ht_pos[h] = -1
                return 0

            jax.lax.fori_loop(0, HSIZE, z, 0)

        @pl.when(flags & F_FRAME_START != 0)
        def _():
            state[0] = 0  # literal stream cursor (frame coords)
            state[1] = 0  # anchor (frame coords) — literal runs cross
            # blocks, like the XLA parse; the downstream stats clamp the
            # first ll of each block (adj_ll) exactly as before.
            # Stage the frame bytes: HBM u8 -> VMEM u8 -> int32 lanes.
            dma = pltpu.make_async_copy(
                frames_hbm.at[frame], u8buf, dma_sem
            )
            dma.start()
            dma.wait()

            def cast_body(r, _):
                framebuf[pl.ds(PADR + r * 32, 32), :] = u8buf[
                    pl.ds(r * 32, 32), :
                ].astype(jnp.int32)
                return 0

            jax.lax.fori_loop(0, FRROWS // 32, cast_body, 0)

        def word_at(pl_local):
            q = pl_local >> 2
            r = (pl_local & 3) * 8
            w0 = words_ref[0, q // BLKW8, q % BLKW8]
            w1 = words_ref[0, (q + 1) // BLKW8, (q + 1) % BLKW8]
            return shr(w0, r) | jnp.where(r == 0, 0, shl(w1, (32 - r) & 31))

        def copy_lits(src, dst, L):
            """frame[src..src+L) -> litbuf[dst..dst+L) (frame coords)."""

            def cond(carry):
                done, _ = carry
                return done < L

            def body(carry):
                done, _ = carry
                dd = dst + done + PADB
                ss = src + done + PADB
                c = jnp.minimum(L - done, 1024 - (dd & 127))
                delta = ss - dd
                k = jax.lax.rem(jax.lax.rem(delta, 128) + 128, 128)
                a = (delta - k) // 128
                pr0 = dd // 128
                sr = pr0 + a
                t0 = framebuf[pl.ds(sr, 8), :]
                t1 = framebuf[pl.ds(sr + 1, 8), :]
                pre = jnp.where(lane < k, t1, t0)
                sh = jnp.where(k == 0, 0, 128 - k)
                rolled = pltpu.roll(pre, sh, 1)
                cur = litbuf[pl.ds(pr0, 8), :]
                gpos = pr0 * 128 + gidx
                mask = (gpos >= dd) & (gpos < dd + c)
                litbuf[pl.ds(pr0, 8), :] = jnp.where(mask, rolled, cur)
                return done + c, 0

            jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

        def match_len(a, b, maxlen):
            """Bytes equal between frame[a..] and frame[b..] (b < a),
            capped at maxlen."""

            def cond(carry):
                done, stop = carry
                return (done < maxlen) & (stop == 0)

            def body(carry):
                done, _ = carry
                aa = a + done + PADB
                bb = b + done + PADB
                c = jnp.minimum(maxlen - done, 1024 - (aa & 127))
                delta = bb - aa
                k = jax.lax.rem(jax.lax.rem(delta, 128) + 128, 128)
                adj = (delta - k) // 128
                pr0 = aa // 128
                sr = pr0 + adj
                t0 = framebuf[pl.ds(sr, 8), :]
                t1 = framebuf[pl.ds(sr + 1, 8), :]
                pre = jnp.where(lane < k, t1, t0)
                sh = jnp.where(k == 0, 0, 128 - k)
                rolled = pltpu.roll(pre, sh, 1)
                cur = framebuf[pl.ds(pr0, 8), :]
                gpos = pr0 * 128 + gidx
                neq = (rolled != cur) & (gpos >= aa) & (gpos < aa + c)
                first = jnp.min(jnp.where(neq, gpos, jnp.int32(1 << 30)))
                hit = first < aa + c
                newdone = jnp.where(hit, done + (first - aa), done + c)
                return newdone, jnp.where(hit, 1, 0)

            done, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(0))
            )
            return done

        def insert(p_local, abs_p):
            w = word_at(p_local)
            h = shr(w * MUL, 32 - HB)
            ht_pos[h] = fbase + abs_p
            ht_word[h] = w

        # Greedy matching over [0, blen-12); the last 12 bytes are always
        # literals (keeps every SMEM word read inside the staged block).
        limit = blen - 12

        def cond(carry):
            p, anchor, nseq, mlsum = carry
            return (p < limit) & (nseq < SBd)

        def body(carry):
            p, anchor, nseq, mlsum = carry
            w = word_at(p)
            h = shr(w * MUL, 32 - HB)
            cand_gp = ht_pos[h]
            cand_w = ht_word[h]
            abs_p = bs + p
            ht_pos[h] = fbase + abs_p
            ht_word[h] = w
            cand = cand_gp - fbase
            probe = (cand_gp >= fbase) & (cand_w == w)

            # Zero-trip-on-miss: match_len/copy_lits are while loops whose
            # first condition check exits immediately at L == 0, so misses
            # pay only a couple of scalar compares (no lax.cond needed).
            ext = match_len(
                abs_p + 4, cand + 4,
                jnp.where(probe, bs + blen - (abs_p + 4), 0),
            )
            ml = 4 + ext
            # Accept >= 5 bytes: a 4-byte match at a frame-sized offset
            # prices worse than four literals (zstd's fast levels use the
            # same minimum).
            hit = probe & (ext >= 1)
            ll = p - anchor  # anchor may be negative (run from prev block)
            copy_lits(bs + anchor, state[0],
                      jnp.where(hit & (ll > 0), ll, 0))
            state[0] = state[0] + jnp.where(hit, ll, 0)

            @pl.when(hit)
            def _():
                ll_out[0, nseq // SBd8, nseq % SBd8] = ll
                ml_out[0, nseq // SBd8, nseq % SBd8] = ml
                off_out[0, nseq // SBd8, nseq % SBd8] = abs_p - cand

            # Sparse in-match insertions (level-1 style).
            @pl.when(hit & (p + 1 < limit))
            def _():
                insert(p + 1, abs_p + 1)

            @pl.when(hit & (p + ml - 2 < limit))
            def _():
                insert(p + ml - 2, abs_p + ml - 2)

            p_next = jnp.where(hit, p + ml, p + 1 + shr(p - anchor, 8))
            anchor = jnp.where(hit, p + ml, anchor)
            nseq = nseq + jnp.where(hit, 1, 0)
            mlsum = mlsum + jnp.where(hit, ml, 0)
            return p_next, anchor, nseq, mlsum

        anchor0 = state[1] - bs  # block-local (negative when the pending
        # literal run started in an earlier block)
        (p, anchor, nseq, mlsum) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), anchor0, jnp.int32(0), jnp.int32(0))
        )
        state[1] = bs + anchor

        row = jnp.zeros((1, 128), jnp.int32)
        li = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(li == 0, nseq, row)
        row = jnp.where(li == 1, mlsum, row)
        # Overflow marker: the position loop stopped early with real
        # bytes left (nseq == SBd is unreachable for BLK/4 <= SBd, kept
        # as a belt-and-braces signal for smaller SBd builds).
        row = jnp.where(li == 2, jnp.where((nseq >= SBd) & (p < limit), 1, 0),
                        row)
        meta_out[pl.ds(i, 1), :] = row

        @pl.when(flags & F_FRAME_END != 0)
        def _():
            # Frame-trailing literals: everything after the last match.
            trail = (bs + blen) - state[1]

            @pl.when(trail > 0)
            def _():
                copy_lits(state[1], state[0], trail)

            state[0] = state[0] + trail

            def cast_body(r, _):
                u8buf[pl.ds(r * 32, 32), :] = litbuf[
                    pl.ds(PADR + r * 32, 32), :
                ].astype(jnp.uint8)
                return 0

            jax.lax.fori_loop(0, FRROWS // 32, cast_body, 0)
            dma = pltpu.make_async_copy(u8buf, lits_hbm.at[frame], out_sem)
            dma.start()
            dma.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NRECP,),
        in_specs=[
            pl.BlockSpec((1, 8, BLKW8), lambda i, m: (m[i, M_WROW], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # frames (F, FRROWS, 128) u8
        ],
        out_specs=[
            pl.BlockSpec((1, 8, SBd8), lambda i, m: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, SBd8), lambda i, m: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, SBd8), lambda i, m: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # lits (F, FRROWS, 128) u8
            pl.BlockSpec((NREC8, 128), lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((PADR + FRROWS + 8, 128), jnp.int32),  # frame bytes
            pltpu.VMEM((PADR + FRROWS + 8, 128), jnp.int32),  # literal bytes
            pltpu.VMEM((FRROWS, 128), jnp.uint8),             # staging
            pltpu.SMEM((HSIZE,), jnp.int32),
            pltpu.SMEM((HSIZE,), jnp.int32),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    def call(meta, words, frames_u8):
        nb = words.shape[0]
        words3 = words.reshape(nb, 8, BLKW8)
        frames3 = frames_u8.reshape(F, FRROWS, 128)
        ll, ml, off, lits, meta_out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((NRECP, 8, SBd8), jnp.int32),
                jax.ShapeDtypeStruct((NRECP, 8, SBd8), jnp.int32),
                jax.ShapeDtypeStruct((NRECP, 8, SBd8), jnp.int32),
                jax.ShapeDtypeStruct((F, FRROWS, 128), jnp.uint8),
                jax.ShapeDtypeStruct((NREC8, 128), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
            ),
            interpret=interpret,
        )(meta, words3, frames3)
        return (
            ll.reshape(NRECP, SBd), ml.reshape(NRECP, SBd),
            off.reshape(NRECP, SBd), lits.reshape(F, FR),
            meta_out[:NRECP],
        )

    return jax.jit(call)


def get_match_kernel(BLK: int, FR: int, SBd: int, NRECP: int, F: int,
                     interpret: bool = False):
    key = (BLK, FR, SBd, NRECP, F, interpret)
    if key not in _fns:
        _fns[key] = _build(*key)
    return _fns[key]


def build_records(F: int, B: int, BLK: int, lengths):
    """meta int32[F*B, META_COLS]: one record per (frame, block)."""
    meta = np.zeros((F * B, META_COLS), np.int32)
    r = 0
    for f in range(F):
        n_valid = int(lengths[f])
        for b in range(B):
            bs = b * BLK
            meta[r, M_FRAME] = f
            meta[r, M_WROW] = r
            meta[r, M_BS] = bs
            meta[r, M_BLEN] = max(0, min(BLK, n_valid - bs))
            meta[r, M_FLAGS] = (F_FRAME_START if b == 0 else 0) | (
                F_FRAME_END if b == B - 1 else 0
            )
            r += 1
    return meta
