"""Microbench: gather/scatter/scan cost model on the live chip.

Times the primitive shapes both pipelines are built from, to answer:
- does gather cost depend on index locality? on table size?
- row-gather width scaling (the (n, K) trick's actual curve)
- scatter vs gather
- lax.scan iteration overhead (the FSE scans' floor)
Pull-fenced timing (block_until_ready returns early through this tunnel).
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

F, N = 10, 1 << 20


def fence(arr):
    return np.asarray(jnp.sum(arr[..., ::251].astype(jnp.int32)))


def t(name, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    fence(out if not isinstance(out, tuple) else out[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn_j(*args)
        fence(out if not isinstance(out, tuple) else out[0])
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1e3:.0f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, 1 << 30, (F, N)).astype(np.int32))
    idx_rand = jnp.asarray(rng.integers(0, N, (F, N)).astype(np.int32))
    idx_near = jnp.asarray(
        (np.arange(N)[None, :] - rng.integers(1, 256, (F, N))).clip(0).astype(np.int32)
    )
    idx_seq = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (F, N))

    vg = jax.vmap(lambda t_, i_: t_[i_])
    t("gather 10x1M random idx", vg, tab, idx_rand)
    t("gather 10x1M near idx (off<256)", vg, tab, idx_near)
    t("gather 10x1M sequential idx", vg, tab, idx_seq)

    small_tab = tab[:, : 1 << 14]
    idx_small = jnp.asarray(rng.integers(0, 1 << 14, (F, N)).astype(np.int32))
    t("gather 10x1M from 16K table", vg, small_tab, idx_small)

    # Row-gather width scaling.
    for K in (2, 4, 8, 16):
        tabK = jnp.asarray(
            rng.integers(0, 1 << 30, (F, N, K)).astype(np.int32)
        )
        t(f"row gather 10x1M width {K}", jax.vmap(lambda t_, i_: t_[i_]), tabK, idx_rand)

    # uint8 vs int32 gather
    tab8 = tab.astype(jnp.uint8)
    t("gather 10x1M uint8", vg, tab8, idx_rand)

    # Scatter
    vals = tab
    t("scatter 10x1M set", jax.vmap(lambda i_, v_: jnp.zeros(N, jnp.int32).at[i_].set(v_)), idx_rand, vals)
    t("scatter-add 10x1M", jax.vmap(lambda i_, v_: jnp.zeros(N, jnp.int32).at[i_].add(v_)), idx_rand, vals)

    # cumsum
    t("cumsum 10x1M", jax.vmap(jnp.cumsum), tab)

    # argsort
    t("argsort 10x1M", jax.vmap(lambda h: jnp.argsort(h, stable=True).astype(jnp.int32)), idx_rand)

    # scan overhead: 256 iterations over (320, 8) state — the FSE shape
    st0 = jnp.zeros((320, 8), jnp.int32)
    xs = jnp.asarray(rng.integers(0, 100, (256, 320, 8)).astype(np.int32))

    def scan_fn(st0, xs):
        def body(c, x):
            c = (c * 5 + x) & 1023
            return c, c[:, 0]
        return jax.lax.scan(body, st0, xs)[1]

    t("scan 256 iters (320,8) state", scan_fn, st0, xs)

    xs2 = jnp.asarray(rng.integers(0, 100, (128, 320, 8)).astype(np.int32))
    t("scan 128 iters (320,8) state", scan_fn, st0, xs2)

    # scan with a small per-iter gather (FSE state-table lookup shape)
    stt = jnp.asarray(rng.integers(0, 512, (320, 512)).astype(np.int32))

    def scan_gather_fn(st0, xs):
        def body(c, x):
            g = jnp.take_along_axis(stt, (c[:, :1] + x[:, :1]) & 511, axis=1)
            c = (c + g) & 1023
            return c, c[:, 0]
        return jax.lax.scan(body, st0, xs)[1]

    t("scan 256 iters + rowgather(320,512)", scan_gather_fn, st0, xs)


if __name__ == "__main__":
    main()
