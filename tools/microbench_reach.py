"""Microbench: greedy-reachability formulations on the real chip.

Compares the global pointer-doubling pass (ops.match_tpu.greedy_reachability)
against a block-local variant that exploits the parse invariant that no
match crosses a block boundary (every block start is an anchor), so
reachability factors into independent 32 KiB rows: fewer doublings
(log2(block) vs log2(frame)) and last-axis gathers instead of global ones.

Usage: python tools/microbench_reach.py  (runs on the default platform)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from zeekstd_tpu.jax_setup import ensure_cache

ensure_cache()
import jax
import jax.numpy as jnp

F = 10            # frames
N = 1 << 20       # frame bytes
BLK = 32 << 10    # block size


def fence(arr):
    return np.asarray(jnp.sum(arr[..., ::251].astype(jnp.int32)))


def reach_global(step):
    """Current formulation (ops/match_tpu.py greedy_reachability)."""
    n = step.shape[0]
    p = jnp.arange(n, dtype=jnp.int32)
    f = jnp.concatenate([jnp.minimum(p + step, n), jnp.full(1, n, jnp.int32)])
    reach = (f * 0).at[0].set(1)
    for _ in range(max((n - 1).bit_length(), 1)):
        reach = reach.at[f].max(reach)
        f = f[f]
    return reach[:n].astype(bool)


def reach_blocked(step):
    """Block-local: rows of BLK, local indices, axis-1 doubling."""
    n = step.shape[0]
    nb = n // BLK
    s = step.reshape(nb, BLK)
    p = jnp.arange(BLK, dtype=jnp.int32)[None, :]
    f = jnp.minimum(p + s, BLK)
    f = jnp.concatenate([f, jnp.full((nb, 1), BLK, jnp.int32)], axis=1)
    reach = (f * 0).at[:, 0].set(1)
    for _ in range(max((BLK - 1).bit_length(), 1)):
        # scatter-max along axis 1: out[r, f[r, i]] max= reach[r, i]
        reach = reach.at[jnp.arange(nb)[:, None], f].max(reach)
        f = jnp.take_along_axis(f, f, axis=1)
    return reach[:, :BLK].reshape(n).astype(bool)


def main():
    rng = np.random.default_rng(0)
    # step distribution resembling a text parse: mostly 1, some 4..32 jumps,
    # clamped to the block end like the real limit.
    step_np = np.where(
        rng.random((F, N)) < 0.25, rng.integers(4, 33, (F, N)), 1
    ).astype(np.int32)
    pos_in_blk = np.arange(N) % BLK
    step_np = np.minimum(step_np, (BLK - pos_in_blk).astype(np.int32))

    g = jax.jit(jax.vmap(reach_global))
    b = jax.jit(jax.vmap(reach_blocked))

    steps = jnp.asarray(step_np)
    t0 = time.time(); rg = g(steps); fence(rg)
    print(f"global warmup {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time(); rb = b(steps); fence(rb)
    print(f"blocked warmup {time.time()-t0:.1f}s", file=sys.stderr)

    assert bool(jnp.all(rg == rb)), "variants disagree"

    for name, fn in (("global", g), ("blocked", b)):
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            fence(fn(steps))
            best = min(best, time.time() - t0)
        print(f"{name}: {best*1e3:.1f} ms for {F}x{N>>20}MiB")


if __name__ == "__main__":
    main()
