"""Serial Pallas FSE sequence-bitstream encoder.

Encode twin of the fused decoder (ops/decode_kernel.py): one grid step
per FSE job (= one sequence-bearing block), the scalar core walks the
block's sequences BACKWARD maintaining the three interleaved FSE states
and packs the bitstream into an SMEM word buffer. Replaces the XLA
scan-based ``fse_encode_sequences`` dispatch (~0.8 s per 10 MiB of
gather-bearing scan on this chip) with ~40 scalar ops per sequence.

Inputs ride the match kernel's outputs directly: per job, the (ll<<16 |
ml) and repeat-coded offset-value rows (flat HBM int32, one SBd row per
block record) — no flattened per-frame arrays needed. Symbol codes are
recomputed in-kernel from the values (identical formulas to the glue's
searchsorted: the packed const row carries the zstd LL/ML code LUTs and
base/bits tables).

Stream item order (mirrors ops/entropy.py::fse_encode_sequences and the
host writer codec/seq_encode.py): head = last sequence's ll/ml/of
extras; per sequence i = n-2..0 the fused of/ml/ll state bits then
ll/ml/of extras; tail = final ml/of/ll states at their accuracy logs.
The host finalizer (ops/assemble.py) adds the sentinel and reverses to
the byte stream exactly as for the XLA producer.

Encode-table rows are packed (8, 128) int32 SMEM blocks per category:
[0:64] delta_nb_bits, [64:128] delta_find_state, [128:640] state_table
(reference analog: the FSE encoder under compress_stream2,
lib/src/encode.rs:340-346).
"""

from __future__ import annotations

import numpy as np

# flat meta columns per job
J_REC = 0     # match-kernel record index (frame*B + block)
J_NSEQ = 1
J_TLL = 2     # packed-table row indices
J_TOF = 3
J_TML = 4
J_LOGS = 5    # ll_log | of_log << 5 | ml_log << 10
JMETA_COLS = 8

# packed const layout (flat int32)
C_LLBASE = 0     # 36
C_LLBITS = 64    # 36
C_MLBASE = 128   # 53
C_MLBITS = 192   # 53
C_LLLUT = 256    # 64: ll -> code for ll < 64
C_MLLUT = 320    # 128: (ml-3) -> code for ml-3 < 128
CONSTS_LEN = 512

_fns = {}


def make_consts():
    from ..codec.sequences import LL_BASE, LL_BITS, ML_BASE, ML_BITS

    c = np.zeros(CONSTS_LEN, np.int32)
    c[C_LLBASE : C_LLBASE + 36] = LL_BASE
    c[C_LLBITS : C_LLBITS + 36] = LL_BITS
    c[C_MLBASE : C_MLBASE + 53] = ML_BASE
    c[C_MLBITS : C_MLBITS + 53] = ML_BITS
    for v in range(64):
        c[C_LLLUT + v] = int(np.searchsorted(LL_BASE, v, side="right")) - 1
    for mb in range(128):
        c[C_MLLUT + mb] = (
            int(np.searchsorted(ML_BASE, mb + 3, side="right")) - 1
        )
    return c


def pack_enc_table(dnb, dfs, stt):
    """One (1024,) int32 row: [0:64] dnb, [64:128] dfs, [128:640] stt."""
    row = np.zeros(1024, np.int32)
    row[0:64] = dnb
    row[64:128] = dfs
    row[128 : 128 + len(stt)] = stt
    return row


def _build(SBd: int, WBo: int, NRECJ: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert SBd % 1024 == 0
    assert WBo & (WBo - 1) == 0, "WBo must be a power of two (SMEM tiling)"
    SBd8 = SBd // 8
    WBo8 = WBo // 8

    shr = jax.lax.shift_right_logical
    shl = jax.lax.shift_left

    def kernel(consts_ref, meta_ref, lm_hbm, ofv_hbm, tll_ref, tof_ref,
               tml_ref, words_out, bits_out, lmrow, ofvrow, dma_sem,
               dma_sem2):
        i = pl.program_id(0)
        mb = i * JMETA_COLS
        rec = meta_ref[mb + J_REC]
        nseq = meta_ref[mb + J_NSEQ]
        logs = meta_ref[mb + J_LOGS]
        ll_log = logs & 31
        of_log = (logs >> 5) & 31
        ml_log = (logs >> 10) & 31

        @pl.when(nseq > 0)
        def _():
            # Distinct semaphores: with a shared one, a hoisted second
            # start can satisfy the first wait with the WRONG completion
            # and the row reads go stale (observed as corrupt bitstreams
            # at 10 MiB scale).
            dma = pltpu.make_async_copy(
                lm_hbm.at[pl.ds(rec * SBd, SBd)], lmrow, dma_sem
            )
            dma2 = pltpu.make_async_copy(
                ofv_hbm.at[pl.ds(rec * SBd, SBd)], ofvrow, dma_sem2
            )
            dma.start()
            dma2.start()
            dma.wait()
            dma2.wait()

        def highbit(x):
            return 31 - jax.lax.clz(jnp.maximum(x, 1))

        def seq_at(j):
            """(llc, mlc, ofc, lle, llb, mle, mlb, ofe) of sequence j."""
            lm = lmrow[j]
            ofv = ofvrow[j]
            ll = shr(lm, 16)
            ml = lm & 0xFFFF
            llc = jnp.where(
                ll < 64,
                consts_ref[C_LLLUT + jnp.minimum(ll, 63)],
                19 + highbit(ll),
            )
            mlb_ = ml - 3
            mlc = jnp.where(
                mlb_ < 128,
                consts_ref[C_MLLUT + jnp.minimum(mlb_, 127)],
                36 + highbit(mlb_),
            )
            ofc = highbit(ofv)
            lle = ll - consts_ref[C_LLBASE + llc]
            llb = consts_ref[C_LLBITS + llc]
            mle = ml - consts_ref[C_MLBASE + mlc]
            mlbi = consts_ref[C_MLBITS + mlc]
            ofe = ofv - shl(jnp.int32(1), ofc)
            return llc, mlc, ofc, lle, llb, mle, mlbi, ofe

        def tb(tref, idx):
            return tref[0, idx >> 7, idx & 127]

        def init_state(tref, sym):
            dnb = tb(tref, sym)
            nb = (dnb + (1 << 15)) >> 16
            value = shl(nb, 16) - dnb
            return tb(tref, 128 + shr(value, nb) + tb(tref, 64 + sym))

        # Forward little-endian bit writer into the SMEM words block.
        # carry: (acc, nbits, widx), 32-bit accumulator. Each add is
        # <= 31 bits; on crossing a word boundary the completed word is
        # stored and the value's spilled high bits seed the next word
        # (n >= 1 whenever a spill happens, so 32-n is a valid shift).
        def wadd(st, val, nb):
            acc, n, w = st
            v = val & (shl(jnp.int32(1), nb) - 1)
            acc2 = acc | shl(v, n)
            sp = n + nb >= 32

            @pl.when(sp)
            def _():
                words_out[0, shr(w, 12), w & 4095] = acc2

            # 32-n is a valid shift whenever sp (n >= 1 there); the clip
            # only sanitizes the discarded non-spill lane.
            acc3 = jnp.where(sp, shr(v, jnp.clip(32 - n, 1, 31)), acc2)
            return acc3, n + nb - jnp.where(sp, 32, 0), w + sp.astype(jnp.int32)

        @pl.when(nseq > 0)
        def _():
            last = nseq - 1
            llc, mlc, ofc, lle, llb, mle, mlbi, ofe = seq_at(last)
            ml_s = init_state(tml_ref, mlc)
            of_s = init_state(tof_ref, ofc)
            ll_s = init_state(tll_ref, llc)

            st = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
            # head: last sequence's extras (ll, ml, of)
            st = wadd(st, lle, llb)
            st = wadd(st, mle, mlbi)
            st = wadd(st, ofe, ofc)

            def body(j, carry):
                ll_s, ml_s, of_s, acc, n, w = carry
                i_ = nseq - 2 - j
                llc, mlc, ofc, lle, llb, mle, mlbi, ofe = seq_at(i_)

                def enc(tref, state, sym):
                    nb = (state + tb(tref, sym)) >> 16
                    new = tb(tref, 128 + shr(state, nb) + tb(tref, 64 + sym))
                    return new, state & (shl(jnp.int32(1), nb) - 1), nb

                of_s2, of_v, of_nb = enc(tof_ref, of_s, ofc)
                ml_s2, ml_v, ml_nb = enc(tml_ref, ml_s, mlc)
                ll_s2, ll_v, ll_nb = enc(tll_ref, ll_s, llc)
                # state bits fused (of low): <= 26 bits
                stv = of_v | shl(ml_v, of_nb) | shl(ll_v, of_nb + ml_nb)
                stt = (acc, n, w)
                stt = wadd(stt, stv, of_nb + ml_nb + ll_nb)
                # extras ll, ml, of (ll low): <= 63 bits total
                stt = wadd(stt, lle, llb)
                stt = wadd(stt, mle, mlbi)
                stt = wadd(stt, ofe, ofc)
                acc, n, w = stt
                return ll_s2, ml_s2, of_s2, acc, n, w

            acc0, n0, w0 = st
            ll_s, ml_s, of_s, acc, n, w = jax.lax.fori_loop(
                0, nseq - 1, body, (ll_s, ml_s, of_s, acc0, n0, w0)
            )

            # tail: final states ml, of, ll
            stt = (acc, n, w)
            stt = wadd(stt, ml_s, ml_log)
            stt = wadd(stt, of_s, of_log)
            stt = wadd(stt, ll_s, ll_log)
            acc, n, w = stt
            total = w * 32 + n

            # Unconditional trailing store: when the stream ends exactly
            # on a word boundary acc is 0, and the finalizer's sentinel
            # byte reads THIS word — leaving stale SMEM there corrupted
            # ~1/32 of blocks (bits % 32 == 0).
            words_out[0, shr(w, 12), w & 4095] = acc

            def zb(s, _):
                bits_out[0, s >> 6, s & 63] = jnp.where(s == 0, total, 0)
                return 0

            jax.lax.fori_loop(0, 512, zb, 0)

        @pl.when(nseq <= 0)
        def _():
            def zb(s, _):
                bits_out[0, s >> 6, s & 63] = 0
                return 0

            jax.lax.fori_loop(0, 512, zb, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NRECJ,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # lm flat (NRECP*SBd,) i32
            pl.BlockSpec(memory_space=pl.ANY),  # ofv flat
            pl.BlockSpec((1, 8, 128), lambda i, c, m: (m[i * JMETA_COLS + J_TLL], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 128), lambda i, c, m: (m[i * JMETA_COLS + J_TOF], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 128), lambda i, c, m: (m[i * JMETA_COLS + J_TML], 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, WBo // 8), lambda i, c, m: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 64), lambda i, c, m: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((SBd,), jnp.int32),
            pltpu.SMEM((SBd,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    def call(consts, meta, lm_flat, ofv_flat, tables):
        words, bits = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((NRECJ, 8, WBo // 8), jnp.int32),
                jax.ShapeDtypeStruct((NRECJ, 8, 64), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
            ),
            interpret=interpret,
        )(consts, meta.reshape(-1), lm_flat, ofv_flat,
          tables.reshape(-1, 8, 128), tables.reshape(-1, 8, 128),
          tables.reshape(-1, 8, 128))
        return (
            jax.lax.bitcast_convert_type(
                words.reshape(NRECJ, WBo), jnp.uint32
            ),
            bits[:, 0, 0],
        )

    return jax.jit(call)


def get_fse_kernel(SBd: int, WBo: int, NRECJ: int, interpret: bool = False):
    key = (SBd, WBo, NRECJ, interpret)
    if key not in _fns:
        _fns[key] = _build(*key)
    return _fns[key]


def bucket_nrecj(n: int) -> int:
    for b in (8, 16, 32, 64, 128, 256, 512, 1024):
        if n <= b:
            return b
    return -(-n // 1024) * 1024
