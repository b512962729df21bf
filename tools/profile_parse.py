"""Micro-profile the TPU encode parse sub-stages on the real device.

Each candidate sub-stage is jitted standalone and timed with a pull fence
(block_until_ready returns early through the axon tunnel). Usage:
    python tools/profile_parse.py [frame_mib]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import build_corpus
from zeekstd_tpu.jax_setup import ensure_cache

ensure_cache()
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: np.asarray(a[..., :1]) if hasattr(a, "shape") and a.ndim else a, out
    )
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda a: np.asarray(a[..., :1]) if hasattr(a, "shape") and a.ndim else a,
            out,
        )
        best = min(best, time.time() - t0)
    print(f"{name:34s} {best*1e3:9.1f} ms")
    return out


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n = mib << 20
    frame_size = 1 << 20
    F = n // frame_size
    corpus = build_corpus(n)
    frames = np.frombuffer(corpus, np.uint8).reshape(F, frame_size)
    frames_d = jnp.asarray(frames)
    lengths_d = jnp.asarray(np.full(F, frame_size, np.int32))

    from zeekstd_tpu.ops import match_tpu as mt

    BLOCK = 32 << 10
    seq_bound = min(1 << 18, max(2048, frame_size // 8))

    # hashes
    h6 = timeit("hash6", jax.jit(jax.vmap(mt.hash_positions_tpu)), frames_d)
    hl = timeit("hash_long", jax.jit(jax.vmap(mt.hash_positions_long)), frames_d)
    h4 = timeit("hash4", jax.jit(jax.vmap(mt.hash_positions_4)), frames_d)

    # argsort alone
    srt = timeit(
        "argsort(h6) x F",
        jax.jit(jax.vmap(lambda h: jnp.argsort(h, stable=True))),
        h6,
    )

    # sorted_hash_matches at the three configs used by level 3
    def shm(depths, cap, cw):
        def one(data, h):
            return mt.sorted_hash_matches(
                data, h, depths, BLOCK, frame_size, cap=cap, cont_words=cw
            )
        return jax.jit(jax.vmap(one))

    timeit("shm short d2 cap16", shm(2, 16, 1), frames_d, h6)
    timeit("shm long  d3 cap16", shm(3, 16, 1), frames_d, hl)
    timeit("shm near4 d1 cap16", shm(1, 16, 1), frames_d, h4)

    # reachability
    def reach_one(data):
        h = mt.hash_positions_tpu(data)
        cand, mlen, cont = mt.sorted_hash_matches(
            data, h, 2, BLOCK, frame_size, cap=16, cont_words=1
        )
        p = jnp.arange(frame_size, dtype=jnp.int32)
        off = p - jnp.maximum(cand, 0)
        offbits = 32 - jnp.clip(jax.lax.clz(jnp.maximum(off, 1)), 0, 31)
        good = jnp.logical_and(mlen >= 4, 6 * mlen >= 14 + offbits)
        step = jnp.where(good, jnp.maximum(mlen, 1), 1)
        return step

    steps = timeit("steps(prep)", jax.jit(jax.vmap(reach_one)), frames_d)
    timeit(
        "reachability chunked",
        jax.jit(
            jax.vmap(lambda s: mt.greedy_reachability(s, frame_size, BLOCK, step_max=24))
        ),
        steps,
    )

    # full parse
    def parse_one(data, nv):
        return mt.parse_frame(data, BLOCK, seq_bound, n_valid=nv, level=3)

    timeit("parse_frame full", jax.jit(jax.vmap(parse_one)), frames_d, lengths_d)


if __name__ == "__main__":
    main()
