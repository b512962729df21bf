"""Pallas TPU kernels for the codec's VPU-friendly passes.

Mosaic (the Pallas TPU backend) lowers ``lax.gather`` only in its
``take_along_axis`` form on a single (8, 128) register tile — a lane
shuffle (axis 1) or sublane shuffle (axis 0) via ``tpu.dynamic_gather``.
Global gathers (the pointer-doubling resolver in ops/seq_exec.py, the
match-candidate probes in ops/match_tpu.py) therefore stay on the XLA
path, which lowers arbitrary gathers natively. What *does* map well onto
hand-written kernels are the passes whose access pattern is tile-local:

- ``byte_histogram_pallas``: per-block byte histograms via one-hot
  accumulation on the VPU (the statistics pass of the batched encoder,
  cf. tpu_archive.tpu_compress_archive).
- ``table_lookup_pallas``: a 256-entry table lookup over bytes (the
  Huffman code/nb_bits map of ops/entropy.huffman_encode_stream),
  expressed as two 128-lane dynamic gathers of the broadcast table
  halves plus a select — the tile-local form Mosaic supports.
- ``reachability_chunked``: the greedy-parse anchor mask (the dominant
  cost of the TPU encode path — ops/match_tpu.greedy_reachability's
  log-depth scatter/gather joins run at HBM gather speed). Greedy steps
  are bounded by the match cap (<= SMAX bytes), so chains are *local*:
  pointer tables for 128-byte chunks are built entirely in registers
  (7 doubling rounds of within-tile lane shuffles — the one gather shape
  Mosaic lowers natively), chunk transfer maps (SMAX entries each)
  compose across a block via one-hot matmuls on the MXU, and a second
  kernel marks the chain per position by in-register binary lifting.

Each has an XLA twin used as the correctness reference; interpret=True
runs the same kernels on CPU for tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hist_kernel(data_ref, out_ref):
    """Byte histogram of one block via one-hot accumulation (VPU).

    Loops over the 256 bin values, comparing the whole block against each
    and storing that bin's per-lane count with a dynamic ref store
    (dynamic indexing of loaded *values* does not lower on TPU).
    """
    data = data_ref[:].astype(jnp.int32)  # (rows, 128)

    def body(b, _):
        cnt = jnp.sum((data == b).astype(jnp.int32), axis=0, keepdims=True)
        out_ref[pl.ds(b, 1), :] = cnt  # (1, 128)
        return 0

    jax.lax.fori_loop(0, 256, body, 0)


def byte_histogram_pallas(data, block: int = 1 << 15, interpret: bool = False):
    """Per-block byte histograms: uint8[n] -> int32[n//block, 256].

    The kernel emits per-lane partial counts (256, 128) per block — a
    tiling-legal output shape — and the final lane reduction runs in XLA.
    """
    n = data.shape[0]
    assert n % block == 0 and block % 128 == 0
    rows = block // 128
    nblk = n // block
    data2 = data.reshape(n // 128, 128)
    out = pl.pallas_call(
        _hist_kernel,
        out_shape=jax.ShapeDtypeStruct((256, nblk * 128), jnp.int32),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((256, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(data2)
    return out.reshape(256, nblk, 128).sum(axis=2).T


def _lut_kernel(tab_ref, data_ref, out_ref):
    """256-entry lookup per byte on one (8, 128) tile.

    The table is split into its two 128-lane halves; each half is
    broadcast across sublanes and lane-gathered by ``byte & 127``
    (``take_along_axis`` on a (8, 128) tile is the one gather shape
    Mosaic lowers), then the halves are selected by ``byte >> 7``.
    """
    tab = tab_ref[:]  # (2, 128)
    d = data_ref[:].astype(jnp.int32)  # (8, 128)
    col = d & 127
    lo = jnp.broadcast_to(tab[0, :][None, :], d.shape)
    hi = jnp.broadcast_to(tab[1, :][None, :], d.shape)
    v_lo = jnp.take_along_axis(lo, col, axis=1)
    v_hi = jnp.take_along_axis(hi, col, axis=1)
    out_ref[:] = jnp.where(d < 128, v_lo, v_hi)


def table_lookup_pallas(data, table, interpret: bool = False):
    """out[i] = table[data[i]] for bytes: uint8[n], int32[256] -> int32[n].

    n must be a multiple of 1024 (one (8, 128) tile per grid step).
    This is the per-symbol map of the Huffman encoder (codes or bit
    counts); its XLA twin is ``jnp.take(table, data)``.
    """
    n = data.shape[0]
    assert n % 1024 == 0, "pad data to a multiple of 1024"
    rows = n // 128
    data2 = data.reshape(rows, 128)
    tab2 = table.astype(jnp.int32).reshape(2, 128)
    out = pl.pallas_call(
        _lut_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        grid=(rows // 8,),
        in_specs=[
            pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tab2, data2)
    return out.reshape(n)


# --- chunked greedy reachability --------------------------------------------

CHUNK = 128  # one chunk per 128-lane register row
SMAX = 32  # max greedy step (match cap); exit phases are < SMAX
N_TABLES = 8  # f^1, f^2, ..., f^128 — binary-lifting tables per chunk


def _ptr_tables_kernel(step_ref, out_ref):
    """Chunk-local pointer-doubling tables, one chunk per sublane row.

    v starts as the one-step target ``lane + step``; values >= CHUNK mean
    the chain exited the chunk with phase ``v - CHUNK`` (< SMAX). Each
    doubling squares the step count; exited values saturate. All eight
    f^(2^k) tables are emitted for the binary-lifting mark kernel.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK), 1)
    v = lane + step_ref[:]
    out_ref[:, 0:CHUNK] = v
    for k in range(1, N_TABLES):
        nxt = jnp.take_along_axis(v, jnp.clip(v, 0, CHUNK - 1), axis=1)
        v = jnp.where(v < CHUNK, nxt, v)
        out_ref[:, k * CHUNK : (k + 1) * CHUNK] = v


def chunk_pointer_tables(step2, interpret: bool = False):
    """step2: int32[rows, 128] (row = chunk) -> int32[rows, 8*128] tables."""
    rows = step2.shape[0]
    return pl.pallas_call(
        _ptr_tables_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, N_TABLES * CHUNK), jnp.int32),
        grid=(rows // 8,),
        in_specs=[pl.BlockSpec((8, CHUNK), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (8, N_TABLES * CHUNK), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(step2)


def _mark_kernel(tab_ref, entry_ref, out_ref):
    """Mark chain positions by binary lifting: advance from the chunk's
    entry phase through the f^(2^k) tables without passing each lane's own
    position; a lane is on the chain iff the walk lands exactly on it."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK), 1)
    cur = entry_ref[:]
    for k in range(N_TABLES - 1, -1, -1):
        tab = tab_ref[:, k * CHUNK : (k + 1) * CHUNK]
        cand = jnp.take_along_axis(tab, jnp.clip(cur, 0, CHUNK - 1), axis=1)
        cur = jnp.where(cand <= lane, cand, cur)
    out_ref[:] = (cur == lane).astype(jnp.int32)


def chunk_mark(tables, entry2, interpret: bool = False):
    """tables: int32[rows, 8*128]; entry2: int32[rows, 128] (entry phase
    broadcast across lanes) -> int32[rows, 128] chain mask."""
    rows = tables.shape[0]
    return pl.pallas_call(
        _mark_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, CHUNK), jnp.int32),
        grid=(rows // 8,),
        in_specs=[
            pl.BlockSpec(
                (8, N_TABLES * CHUNK), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((8, CHUNK), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, CHUNK), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tables, entry2)


def reachability_chunked(step, n: int, block_size: int, interpret: bool = False):
    """Greedy-parse anchor mask via chunk-local pointer tables.

    Requirements (the caller checks): every step in [1, SMAX]; n a
    multiple of CHUNK; block_size a multiple of CHUNK dividing n (or
    >= n); n // min(block_size, n) blocks with a power-of-two chunk
    count each. Steps never cross a block boundary, so every block
    starts a fresh chain at phase 0 — exactly the block factoring of
    ops/match_tpu.greedy_reachability.
    """
    rows = n // CHUNK
    eff_block = min(block_size, n)
    cb = eff_block // CHUNK  # chunks per block (power of two)
    nb = rows // cb

    tables = chunk_pointer_tables(
        step.astype(jnp.int32).reshape(rows, CHUNK), interpret=interpret
    )

    # Chunk transfer maps: f^128 is fully saturated (every within-chunk
    # path exits in <= 128 steps), so its first SMAX lanes are the exit
    # phase for each entry phase.
    m = tables[:, (N_TABLES - 1) * CHUNK : (N_TABLES - 1) * CHUNK + SMAX] - CHUNK
    m = m.reshape(nb, cb, SMAX)

    # Prefix-compose per block (Hillis-Steele over maps): Q[c] maps the
    # block entry phase (always 0) to chunk c's entry phase. Composition
    # is a one-hot matmul — MXU work instead of gathers.
    ident = jnp.broadcast_to(jnp.arange(SMAX, dtype=jnp.int32), (nb, 1, SMAX))
    q = jnp.concatenate([ident, m[:, :-1]], axis=1)
    levels = max((cb - 1).bit_length(), 0)
    for k in range(levels):
        sh = 1 << k
        if sh >= cb:
            break
        qs = jnp.concatenate(
            [jnp.broadcast_to(ident, (nb, sh, SMAX)), q[:, :-sh]], axis=1
        )
        oh = jax.nn.one_hot(qs, SMAX, dtype=jnp.float32)
        q = jnp.einsum("bcej,bcj->bce", oh, q.astype(jnp.float32)).astype(jnp.int32)
    entry = q[:, :, 0].reshape(rows)  # entry phase per chunk

    entry2 = jnp.broadcast_to(entry[:, None], (rows, CHUNK))
    mask = chunk_mark(tables, entry2, interpret=interpret)
    return mask.reshape(n).astype(bool)
