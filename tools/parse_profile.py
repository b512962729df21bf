"""Micro-profile of the TPU parse pipeline substages (compile + run).

Usage: python tools/parse_profile.py [stage ...]
Stages: sorts, short, long, near, full, reach
Each stage compiles jit(vmap(...)) over a (10, 1MiB) batch, reporting
compile seconds and best-of-3 run seconds.
"""
import sys
import time

sys.path.insert(0, ".")

from bench import build_corpus  # noqa: E402

FRAME = 1 << 20
NF = 10


def timed(name, fn, *args):
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:28s} compile {compile_s:7.1f}s  run {best*1000:8.1f}ms", flush=True)
    return out


def main():
    stages = sys.argv[1:] or ["sorts", "short", "long", "near", "full"]
    import numpy as np

    from zeekstd_tpu.jax_setup import ensure_cache

    ensure_cache()
    import jax
    import jax.numpy as jnp

    from zeekstd_tpu.ops import match_tpu as mt

    corpus = build_corpus(NF * FRAME)
    data = jnp.asarray(
        np.frombuffer(corpus, np.uint8).reshape(NF, FRAME)
    )
    n_valid = jnp.full(NF, FRAME, jnp.int32)
    print(f"devices: {jax.devices()}", flush=True)

    if "sorts" in stages:
        @jax.jit
        @jax.vmap
        def three_sorts(d):
            a = jnp.argsort(mt.hash_positions_tpu(d), stable=True)
            b = jnp.argsort(mt.hash_positions_long(d), stable=True)
            c = jnp.argsort(mt.hash_positions_4(d), stable=True)
            return a.sum() + b.sum() + c.sum()

        timed("3x argsort(1M u16-hash)", three_sorts, data)

        @jax.jit
        @jax.vmap
        def one_sort(d):
            return jnp.argsort(mt.hash_positions_tpu(d), stable=True).sum()

        timed("1x argsort", one_sort, data)

    def shm(depths, hashfn, name):
        @jax.jit
        @jax.vmap
        def f(d, nv):
            h = hashfn(d)
            c, m, k = mt.sorted_hash_matches(d, h, depths, 1 << 17, nv, cap=16, cont_words=1)
            return c.sum() + m.sum() + k.sum()

        timed(name, f, data, n_valid)

    if "short" in stages:
        shm(2, mt.hash_positions_tpu, "short family d2 (sort+strips)")
    if "long" in stages:
        shm(3, mt.hash_positions_long, "long family d3")
    if "near" in stages:
        shm(1, mt.hash_positions_4, "near family d1")

    if "reach" in stages:
        @jax.jit
        @jax.vmap
        def reach(d):
            step = (d.astype(jnp.int32) % 7) + 1
            return mt.greedy_reachability(step, FRAME, 1 << 17, step_max=24)

        timed("reachability (pallas)", reach, data)

    if "full" in stages:
        @jax.jit
        @jax.vmap
        def full(d, nv):
            outs = mt.parse_frame(d, 1 << 17, 1 << 17, n_valid=nv, level=3)
            return outs[0].sum() + outs[1].sum() + outs[3]

        timed("parse_frame L3 full", full, data, n_valid)


if __name__ == "__main__":
    main()
