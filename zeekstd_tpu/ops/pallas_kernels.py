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
