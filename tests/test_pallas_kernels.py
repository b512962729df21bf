"""Pallas kernel correctness (interpret mode on CPU).

The same kernels were validated on a real TPU chip (Mosaic lowering);
interpret=True runs identical kernel code through the Pallas interpreter
so CI exercises it without TPU hardware.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zeekstd_tpu.ops.pallas_kernels import byte_histogram_pallas, table_lookup_pallas


@pytest.mark.parametrize("seed,blocks", [(0, 1), (1, 4)])
def test_byte_histogram(seed, blocks):
    rng = np.random.default_rng(seed)
    block = 1 << 13
    data = rng.integers(0, 256, block * blocks).astype(np.uint8)
    got = np.asarray(byte_histogram_pallas(jnp.asarray(data), block=block, interpret=True))
    expect = np.stack(
        [np.bincount(data[i * block : (i + 1) * block], minlength=256) for i in range(blocks)]
    )
    assert np.array_equal(got, expect)


def test_byte_histogram_skewed():
    # Heavily skewed data (long runs) — the shape real literals take.
    data = np.repeat(np.arange(8, dtype=np.uint8), 1 << 11)
    got = np.asarray(byte_histogram_pallas(jnp.asarray(data), block=1 << 13, interpret=True))
    expect = np.stack(
        [np.bincount(data[i << 13 : (i + 1) << 13], minlength=256) for i in range(2)]
    )
    assert np.array_equal(got, expect)


def test_table_lookup():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, 4096).astype(np.uint8)
    tab = rng.integers(0, 1 << 30, 256).astype(np.int32)
    got = np.asarray(table_lookup_pallas(jnp.asarray(data), jnp.asarray(tab), interpret=True))
    assert np.array_equal(got, tab[data])


def test_table_lookup_huffman_shape():
    # Lookup with a realistic Huffman nb_bits table (values 1..11).
    rng = np.random.default_rng(3)
    data = rng.integers(0, 64, 2048).astype(np.uint8)
    nb = np.clip(rng.integers(1, 12, 256), 1, 11).astype(np.int32)
    got = np.asarray(table_lookup_pallas(jnp.asarray(data), jnp.asarray(nb), interpret=True))
    assert np.array_equal(got, nb[data])


def _reach_reference(step_np, n, block):
    """Serial greedy chain per block — the ground truth."""
    reach = np.zeros(n, bool)
    for b0 in range(0, n, block):
        p = b0
        end = min(b0 + block, n)
        while p < end:
            reach[p] = True
            p += step_np[p]
    return reach


@pytest.mark.parametrize("seed,n,block", [
    (0, 1024, 1024), (1, 4096, 1024), (2, 8192, 8192), (3, 16384, 4096),
])
def test_reachability_chunked(seed, n, block):
    from zeekstd_tpu.ops.pallas_kernels import SMAX, reachability_chunked

    rng = np.random.default_rng(seed)
    step = rng.integers(1, SMAX + 1, n).astype(np.int32)
    # Respect the parse invariant: steps never cross a block boundary.
    pos = np.arange(n)
    room = block - (pos % block)
    step = np.minimum(step, room).astype(np.int32)
    got = np.asarray(
        reachability_chunked(jnp.asarray(step), n, block, interpret=True)
    )
    assert np.array_equal(got, _reach_reference(step, n, block))


def test_reachability_chunked_vs_xla_parse_steps():
    # Steps shaped like a real parse: literal runs (1) + capped matches.
    from zeekstd_tpu.ops.match_tpu import greedy_reachability
    from zeekstd_tpu.ops.pallas_kernels import reachability_chunked

    rng = np.random.default_rng(42)
    n, block = 32768, 8192
    step = np.ones(n, np.int32)
    idx = rng.choice(n, 6000, replace=False)
    step[idx] = rng.integers(4, 25, 6000)
    room = block - (np.arange(n) % block)
    step = np.minimum(step, room).astype(np.int32)
    got = np.asarray(reachability_chunked(jnp.asarray(step), n, block, interpret=True))
    want = np.asarray(greedy_reachability(jnp.asarray(step), n, block))
    assert np.array_equal(got, want)
