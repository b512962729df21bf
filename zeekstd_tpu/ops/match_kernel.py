"""Serial Pallas LZ77 match finder v4: all-scalar hot loop over SMEM.

Round-3's kernel extended matches and copied literals with (8, 128)
vector tiles; measured on this chip, ANY vector-op sequence inside a
serial scalar loop costs ~300-500 ns of scalar<->vector synchronization
latency. This version keeps the ENTIRE hot loop on the scalar core: a
512 KiB sliding window of the frame lives in SMEM as packed
little-endian words (the window libzstd's level-1 fast strategy uses),
so match extension, repeat-offset probes and literal packing are all
plain SMEM word reads.

v4 quality/speed changes (config chosen by grid-searching the native
twin, tools/native_prof.cpp — ratio transfers between the two because
the loops share semantics):
  - 1-step lazy race with the cost-aware gain rule (the native
    parse_block's): a match at p+1 displaces the match at p only when
    its offset-cost-aware score clearly wins; rep matches keep their
    no-offset-cost bonus. Closes ~1.1pp of ratio on the bench corpus.
  - backward extension: a committed match extends backward over the
    pending literal run (bounded by the block start and the window).
  - stride-2 in-match insertion capped at 8 interior positions: dense
    insertion is the difference between 24.5% and 23.6% on text; the
    cap stops refreshing deep interiors of long matches.
  - ll/ml/of histograms moved OUT of the scalar loop — the XLA glue
    computes them from the emitted rows (3 SMEM read-modify-writes per
    sequence were pure loop latency). The literal histogram stays
    in-kernel (it rides the literal packing loop).
  - match extension compares 8 bytes per iteration.

Per visited position (reference analog: the level-1/2 match loop under
compress_stream2, lib/src/encode.rs:340-346): read two words from the
window, hash 6 bytes, probe a single-entry hash table storing (tagged
position, word) — a hit guarantees >= 4 matching bytes with no verify
read; probe rep1 first and take it unconditionally (zstd's dfast
repcode-favoring rule); gate hash matches by 6*ml >= 14+bitlen(offset).

Outputs per (frame, block) record, all SMEM-staged rows:
  lm   (8, SBd8)  (ll_written << 16) | ml per sequence
  ofv  (8, SBd8)  repeat-coded offset values
  litw (8, 1024)  the block's literal bytes packed LE into words
  stat (8, 64)    literal histogram + counters (see ST_* layout)

Cross-block state (literal-run anchor, rep history) threads through
SMEM scratch; blocks of one frame must therefore be visited in order
(frame-major records). Rep locality is tracked so the host can demote
dependent blocks when a raw-block fallback breaks the rep chain a
later block relies on (stat ST_EXTREP).

The kernel is shape-keyed on (BLK, SBd, NRECP) only: per-record frame
base offsets ride in meta (M_FBASE), so one Mosaic compile serves any
frame count — callers bucket NRECP (pad with blen=0 records) to reuse
compiles across input sizes.
"""

from __future__ import annotations

import numpy as np

# meta columns
M_FRAME = 0
M_BS = 1      # block start within frame (bytes)
M_BLEN = 2    # valid bytes in block
M_FLAGS = 3
M_WOFF = 4    # word offset of the block in the flat words array, /1024
M_SLOT = 5    # window slot index for this block
M_FBASE = 6   # frame base offset for hash tags (frame * frame_size)
META_COLS = 8

F_FRAME_START = 1
F_FRAME_END = 2

# stat row layout (index into the flattened (8, 64) = 512-slot block)
ST_NSEQ = 0
ST_MLSUM = 1
ST_LITCNT = 2
ST_EXTREP = 3      # block reads rep history inherited from earlier blocks
ST_OVERFLOW = 4
ST_LLHIST = 5      # 36 bins (filled by the post-loop code pass)
ST_MLHIST = 41     # 53 bins
ST_OFHIST = 94     # 32 bins
ST_LITHIST = 128   # 256 bins
ST_TRASH = 508     # disabled histogram increments land here

HB = 14            # hash bits: 2^HB entries x (pos, word) in SMEM
WIN_LOG = 19       # sliding window: 512 KiB (libzstd level-1 window)
INS_CAP = 16       # interior insertion reach (positions 1..INS_CAP, step 2)
LAZY_ML_MAX = 32   # no lazy race once the first match is this long

_fns = {}


def _build(BLK: int, SBd: int, NRECP: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert BLK % 4096 == 0 and SBd % 8 == 0
    WIN = 1 << WIN_LOG
    WMASK = (WIN >> 2) - 1
    BLKW = BLK // 4
    BLKW8 = BLKW // 8
    SBd8 = SBd // 8
    HSIZE = 1 << HB

    shr = jax.lax.shift_right_logical
    shl = jax.lax.shift_left
    M1 = np.int32(2654435761 - (1 << 32))  # Knuth multiplier (wraps)
    M2 = np.int32(0x85EBCA77 - (1 << 32))

    def kernel(consts_ref, meta_ref, words_hbm, lm_out, ofv_out, litw_out,
               stat_out, win, ht_pos, ht_word, state, dma_sem):
        i = pl.program_id(0)
        # meta rides flat (NRECP*META_COLS,): a 2-D SMEM operand would be
        # lane-padded 8 -> 128 columns (16x the footprint).
        mb = i * META_COLS
        bs = meta_ref[mb + M_BS]
        blen = meta_ref[mb + M_BLEN]
        flags = meta_ref[mb + M_FLAGS]
        fbase = meta_ref[mb + M_FBASE]
        bend = bs + blen
        lo_win = jnp.maximum(bend - WIN, 0)

        @pl.when(i == 0)
        def _():
            def z(h, _):
                ht_pos[h] = -(1 << 30)
                return 0

            jax.lax.fori_loop(0, HSIZE, z, 0)

        # Stage this block's words into its window slot (HBM -> SMEM DMA).
        # M_WOFF is stored in 1024-word units and multiplied here so
        # Mosaic can PROVE the dynamic HBM offset is tile-aligned (a raw
        # SMEM-loaded offset fails its divisibility check).
        @pl.when(blen > 0)
        def _():
            dma = pltpu.make_async_copy(
                words_hbm.at[pl.ds(meta_ref[mb + M_WOFF] * 1024, BLKW)],
                win.at[pl.ds(meta_ref[mb + M_SLOT] * BLKW, BLKW)],
                dma_sem,
            )
            dma.start()
            dma.wait()

        @pl.when(flags & F_FRAME_START != 0)
        def _():
            state[0] = 0  # literal-run anchor (frame coords)
            state[1] = 1  # rep1
            state[2] = 4  # rep2
            state[3] = 8  # rep3

        # Clear the stat block (its SMEM staging starts undefined).
        def zstat(s, _):
            stat_out[0, s >> 6, s & 63] = 0
            return 0

        jax.lax.fori_loop(0, 512, zstat, 0)

        def win_w(q):
            """Little-endian 4-byte word at frame byte q (window coords)."""
            qi = shr(q, 2)
            s = (q & 3) * 8
            a = win[qi & WMASK]
            b = win[(qi + 1) & WMASK]
            return jnp.where(
                s == 0, a, shr(a, s) | shl(b, (32 - s) & 31)
            )

        def win_b(q):
            """Byte at frame position q."""
            return shr(win[shr(q, 2) & WMASK], (q & 3) * 8) & 0xFF

        def highbit(x):
            return 31 - jax.lax.clz(jnp.maximum(x, 1))

        def hinc(base, b, en):
            idx = jnp.where(en, base + b, ST_TRASH)
            hi, lo = idx >> 6, idx & 63
            stat_out[0, hi, lo] = stat_out[0, hi, lo] + 1

        def tailbytes(x):
            return (
                ((x & 0xFF) == 0).astype(jnp.int32)
                + ((x & 0xFFFF) == 0).astype(jnp.int32)
                + ((x & 0xFFFFFF) == 0).astype(jnp.int32)
            )

        def extend(a, b, maxl):
            """Matching bytes between frame positions a and b (b < a),
            8 bytes per iteration from the window, capped at maxl (>= 0).
            Reads past `a + maxl` may touch stale window slots; the
            min() caps make the result exact regardless."""

            def cond(c):
                return c[1]

            def body(c):
                k, _ = c
                x1 = win_w(a + k) ^ win_w(b + k)
                x2 = win_w(a + k + 4) ^ win_w(b + k + 4)
                eq1 = x1 == 0
                eq2 = x2 == 0
                add = jnp.where(
                    eq1, jnp.where(eq2, 8, 4 + tailbytes(x2)), tailbytes(x1)
                )
                k2 = jnp.minimum(k + add, maxl)
                return k2, eq1 & eq2 & (k2 < maxl)

            k, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), maxl > 0)
            )
            return k

        def emit_lits(src, dst, L):
            """Pack frame bytes [src, src+L) into litw at byte dst and
            bump the literal histogram. 4 bytes per step."""

            def cond(c):
                return c < L

            def body(done):
                w = win_w(src + done)
                take = jnp.minimum(4, L - done)
                d = dst + done
                j = shr(d, 2)
                s = (d & 3) * 8
                m = jnp.where(take >= 4, jnp.int32(-1), shl(1, take * 8) - 1)
                v = w & m
                jh, jl = j // BLKW8, j % BLKW8
                old = litw_out[0, jh, jl]
                litw_out[0, jh, jl] = (old & ~shl(m, s)) | shl(v, s)

                @pl.when(s + take * 8 > 32)
                def _():
                    j2 = j + 1
                    sh2 = (32 - s) & 31
                    j2h, j2l = j2 // BLKW8, j2 % BLKW8
                    old2 = litw_out[0, j2h, j2l]
                    litw_out[0, j2h, j2l] = (
                        (old2 & ~shr(m, sh2)) | shr(v, sh2)
                    )

                hinc(ST_LITHIST, w & 0xFF, True)
                hinc(ST_LITHIST, shr(w, 8) & 0xFF, take > 1)
                hinc(ST_LITHIST, shr(w, 16) & 0xFF, take > 2)
                hinc(ST_LITHIST, shr(w, 24) & 0xFF, take > 3)
                return done + 4

            jax.lax.while_loop(cond, body, jnp.int32(0))

        def probe(abs_p, r1):
            """One position probe: rep1 first (taken unconditionally),
            then the tagged single-entry hash table with the cost gate.
            Inserts abs_p into the table. Returns (hit, src, ml)."""
            qi = shr(abs_p, 2)
            s = (abs_p & 3) * 8
            a0 = win[qi & WMASK]
            a1 = win[(qi + 1) & WMASK]
            a2 = win[(qi + 2) & WMASK]
            nz = s != 0
            w = jnp.where(nz, shr(a0, s) | shl(a1, (32 - s) & 31), a0)
            w2 = jnp.where(nz, shr(a1, s) | shl(a2, (32 - s) & 31), a1)
            h = shr((w * M1) ^ ((w2 & 0xFFFF) * M2), 32 - HB)
            cand_gp = ht_pos[h]
            cand_w = ht_word[h]
            ht_pos[h] = fbase + abs_p
            ht_word[h] = w

            rsrc = abs_p - r1
            rep_hit = (rsrc >= lo_win) & (win_w(rsrc) == w)

            cand = cand_gp - fbase
            hash_ok = (cand_gp >= fbase + lo_win) & (cand_w == w)

            src = jnp.where(rep_hit, rsrc, cand)
            check = rep_hit | hash_ok
            maxl = jnp.where(check, bend - (abs_p + 4), 0)
            ml = 4 + extend(abs_p + 4, src + 4, maxl)
            off = abs_p - src
            hit = check & (
                rep_hit | (6 * ml >= 14 + highbit(off) + 1)
            )
            return hit, rep_hit, src, ml, off

        def insert(abs_q):
            q0 = win_w(abs_q)
            q1 = win_w(abs_q + 4)
            h = shr((q0 * M1) ^ ((q1 & 0xFFFF) * M2), 32 - HB)
            ht_pos[h] = fbase + abs_q
            ht_word[h] = q0

        limit = blen - 12

        def cond(carry):
            p = carry[0]
            return p < limit

        def body(carry):
            (p, anchor, nseq, mlsum, litdst, r1, r2, r3, repm, ext_rep) = carry
            abs_p = bs + p
            hit, rep_hit, src, ml, off = probe(abs_p, r1)

            # 1-step lazy race (cost-aware): only for short non-rep
            # matches; the probe at p+1 also inserts p+1 into the table.
            do_lazy = (
                hit & ~rep_hit & (ml < LAZY_ML_MAX) & (p + 1 < limit)
            )

            def lazy_branch(_):
                hit2, rep2, src2, ml2, off2 = probe(abs_p + 1, r1)
                sc1 = 4 * ml - highbit(off)
                sc2 = jnp.where(
                    rep2, 4 * ml2 + 2, 4 * ml2 - highbit(jnp.maximum(off2, 1))
                )
                take2 = hit2 & (sc2 > sc1 + 1)
                return (
                    jnp.where(take2, abs_p + 1, abs_p),
                    jnp.where(take2, src2, src),
                    jnp.where(take2, ml2, ml),
                    jnp.where(take2, off2, off),
                )

            def no_lazy(_):
                return abs_p, src, ml, off

            m_pos, src, ml, off = jax.lax.cond(
                do_lazy, lazy_branch, no_lazy, 0
            )

            # Backward extension over the pending literal run (bounded by
            # the literal anchor, the block start, and the window).
            lstart = jnp.maximum(anchor, bs)
            max_back = jnp.where(
                hit, jnp.minimum(m_pos - lstart, src - lo_win), 0
            )

            def bcond(k):
                return (
                    (k < max_back)
                    & (win_b(m_pos - k - 1) == win_b(src - k - 1))
                )

            back = jax.lax.while_loop(bcond, lambda k: k + 1, jnp.int32(0))
            m_pos = m_pos - back
            src = src - back
            ml = ml + back

            ll = m_pos - anchor
            ll_w = jnp.minimum(ll, m_pos - bs)

            # Repeat-offset VALUE (encoder side of RFC 8878
            # 3.1.1.3.2.1.1: the ll == 0 row shifts which history slot
            # each code addresses).
            isz = ll_w == 0
            o1 = jnp.where(isz, r2, r1)
            o2 = jnp.where(isz, r3, r2)
            o3 = jnp.where(isz, r1 - 1, r3)
            ofv = jnp.where(
                off == o1, 1,
                jnp.where(off == o2, 2, jnp.where(off == o3, 3, off + 3)),
            )
            # Which locality bit backs the emitted rep code (1-3)?
            ridx = ofv + isz.astype(jnp.int32)  # 1..4 when ofv <= 3
            rbit = jnp.where(
                ridx == 1, repm & 1,
                jnp.where(ridx == 2, (repm >> 1) & 1,
                          jnp.where(ridx == 3, (repm >> 2) & 1, repm & 1)),
            )
            uses_inh = (ofv <= 3) & (rbit == 0)

            # History + locality update (mirrors the decoders').
            moved = (ofv > 3) | (ridx != 1)
            nr3 = jnp.where(ridx == 2, r3, jnp.where(moved, r2, r3))
            nr2 = jnp.where(moved, r1, r2)
            nr1 = jnp.where(moved, off, r1)
            b1, b2, b3 = repm & 1, (repm >> 1) & 1, (repm >> 2) & 1
            nb3 = jnp.where(ridx == 2, b3, jnp.where(moved, b2, b3))
            nb2 = jnp.where(moved, b1, b2)
            nrepm = 1 | (nb2 << 1) | (nb3 << 2)

            # nseq < SBd: a block can emit at most SBd = BLK/4 sequences
            # (every hit advances >= 4); at exactly SBd the output rows
            # are full — stop emitting and flag overflow so the frame
            # falls back to the host encoder.
            hit = hit & (nseq < SBd)

            @pl.when(hit)
            def _():
                emit_lits(lstart, litdst, ll_w)
                lm_out[0, nseq // SBd8, nseq % SBd8] = shl(ll_w, 16) | ml
                ofv_out[0, nseq // SBd8, nseq % SBd8] = ofv

            # Strided interior insertion (stride 2, capped reach): dense
            # insertion is ~1pp of ratio on text; the cap bounds the
            # serial cost on long matches.
            stop = jnp.where(
                hit,
                jnp.minimum(
                    jnp.minimum(m_pos + ml, bs + limit), m_pos + 1 + INS_CAP
                ),
                0,
            )

            def icond(q):
                return q < stop

            def ibody(q):
                insert(q)
                return q + 2

            jax.lax.while_loop(icond, ibody, m_pos + 1)

            p_next = jnp.where(hit, m_pos + ml - bs, p + 1 + shr(ll, 8))
            return (
                p_next,
                jnp.where(hit, m_pos + ml, anchor),
                nseq + jnp.where(hit, 1, 0),
                mlsum + jnp.where(hit, ml, 0),
                litdst + jnp.where(hit, ll_w, 0),
                jnp.where(hit, nr1, r1),
                jnp.where(hit, nr2, r2),
                jnp.where(hit, nr3, r3),
                jnp.where(hit, nrepm, repm),
                ext_rep | jnp.where(hit & uses_inh, 1, 0),
            )

        (p, anchor, nseq, mlsum, litdst, r1, r2, r3, repm, ext_rep) = (
            jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), state[0], jnp.int32(0), jnp.int32(0),
                 jnp.int32(0), state[1], state[2], state[3], jnp.int32(0),
                 jnp.int32(0)),
            )
        )

        # Block-trailing literals (the pending run's in-block part).
        lstart = jnp.maximum(anchor, bs)
        trail = jnp.maximum(bend - lstart, 0)

        @pl.when(trail > 0)
        def _():
            emit_lits(lstart, litdst, trail)

        state[0] = anchor
        state[1] = r1
        state[2] = r2
        state[3] = r3

        # Post-loop code-histogram pass over the rows just emitted: a
        # tight serial walk (~12 ops/seq) replaces ~0.2 s/10 MiB of XLA
        # flatten + scatter in the glue. Formulas identical to the FSE
        # kernel's (ops/fse_kernel.py consts layout).
        def hist_body(j, _):
            lm = lm_out[0, j // SBd8, j % SBd8]
            ofvj = ofv_out[0, j // SBd8, j % SBd8]
            ll = shr(lm, 16)
            ml = lm & 0xFFFF
            llc = jnp.where(
                ll < 64,
                consts_ref[256 + jnp.minimum(ll, 63)],
                19 + highbit(ll),
            )
            mlb_ = ml - 3
            mlc = jnp.where(
                mlb_ < 128,
                consts_ref[320 + jnp.minimum(mlb_, 127)],
                36 + highbit(mlb_),
            )
            hinc(ST_LLHIST, llc, True)
            hinc(ST_MLHIST, mlc, True)
            hinc(ST_OFHIST, highbit(ofvj), True)
            return 0

        jax.lax.fori_loop(0, nseq, hist_body, 0)

        stat_out[0, ST_NSEQ >> 6, ST_NSEQ & 63] = nseq
        stat_out[0, ST_MLSUM >> 6, ST_MLSUM & 63] = mlsum
        stat_out[0, ST_LITCNT >> 6, ST_LITCNT & 63] = litdst + trail
        stat_out[0, ST_EXTREP >> 6, ST_EXTREP & 63] = ext_rep
        stat_out[0, ST_OVERFLOW >> 6, ST_OVERFLOW & 63] = jnp.where(
            nseq >= SBd, 1, 0
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NRECP,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # words (NRECP*BLKW,) i32
        ],
        out_specs=[
            pl.BlockSpec((1, 8, SBd8), lambda i, c, m: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, SBd8), lambda i, c, m: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, BLKW // 8), lambda i, c, m: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 64), lambda i, c, m: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((WIN // 4,), jnp.int32),
            pltpu.SMEM((HSIZE,), jnp.int32),
            pltpu.SMEM((HSIZE,), jnp.int32),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    def call(consts, meta, words_flat):
        meta = meta.reshape(-1)
        lm, ofv, litw, stat = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((NRECP, 8, SBd8), jnp.int32),
                jax.ShapeDtypeStruct((NRECP, 8, SBd8), jnp.int32),
                jax.ShapeDtypeStruct((NRECP, 8, BLKW // 8), jnp.int32),
                jax.ShapeDtypeStruct((NRECP, 8, 64), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
            ),
            interpret=interpret,
        )(consts, meta, words_flat)
        return (
            lm.reshape(NRECP, SBd), ofv.reshape(NRECP, SBd),
            litw.reshape(NRECP, BLKW), stat.reshape(NRECP, 512),
        )

    return jax.jit(call)


def get_match_kernel(BLK: int, SBd: int, NRECP: int, interpret: bool = False):
    key = (BLK, SBd, NRECP, interpret)
    if key not in _fns:
        _fns[key] = _build(*key)
    return _fns[key]


def bucket_nrecp(n: int) -> int:
    """Round the record count up to a canonical grid size so one Mosaic
    compile serves a range of input sizes (padding records have blen=0
    and cost ~microseconds each)."""
    for b in (8, 16, 32, 64, 128, 192, 256, 384, 512, 768, 1024):
        if n <= b:
            return b
    return -(-n // 1024) * 1024


def build_records(F: int, B: int, BLK: int, FR: int, lengths,
                  n_pad: int | None = None):
    """meta int32[n_pad or F*B, META_COLS]: one record per (frame, block),
    in frame-major order (the kernel threads state across a frame's
    blocks). Padding records have blen=0 (skipped by the kernel)."""
    assert F * FR < (1 << 31), "hash tags need frame*FR + pos < 2^31"
    WIN = 1 << WIN_LOG
    NSLOT = max(WIN // BLK, 1)
    nrec = F * B
    meta = np.zeros((n_pad if n_pad else nrec, META_COLS), np.int32)
    r = 0
    for f in range(F):
        n_valid = int(lengths[f])
        for b in range(B):
            bs = b * BLK
            meta[r, M_FRAME] = f
            meta[r, M_BS] = bs
            meta[r, M_BLEN] = max(0, min(BLK, n_valid - bs))
            meta[r, M_FLAGS] = (F_FRAME_START if b == 0 else 0) | (
                F_FRAME_END if b == B - 1 else 0
            )
            meta[r, M_WOFF] = (f * FR + bs) // 4096  # 1024-word units
            meta[r, M_SLOT] = b % NSLOT
            meta[r, M_FBASE] = f * FR
            r += 1
    return meta
