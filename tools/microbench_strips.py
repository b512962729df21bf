"""Microbench: cost split of the sorted-hash match search on the chip.

Times, for the bench workload shape (10 frames x 1 MiB), each building
block of ops.match_tpu: argsort, the word-strip gathers, the shifted
compare loops, and the scatter back to position space. Guides which part
to attack next; pull-fenced timing.
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

from zeekstd_tpu.ops.match_tpu import (
    MATCH_CAP,
    CONT_WORDS,
    hash_positions_tpu,
    precompute_words,
)

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
    data = jnp.asarray(rng.integers(0, 64, (F, N)).astype(np.uint8))

    h = t("hash", jax.vmap(hash_positions_tpu), data)
    order = t("argsort", jax.vmap(lambda h: jnp.argsort(h, stable=True).astype(jnp.int32)), h)
    words = t("words", jax.vmap(precompute_words), data)

    n_strips = MATCH_CAP // 4 + CONT_WORDS

    def strips_fn(words, order):
        return sum(
            jnp.sum(words[jnp.minimum(order + 4 * k, N - 1)])
            for k in range(n_strips)
        )

    t(f"strips x{n_strips} (one table)", jax.vmap(strips_fn), words, order)

    def strips2_fn(words, order):
        return sum(
            jnp.sum(words[jnp.minimum(order + 4 * k, N - 1)]) for k in range(2)
        )

    t("strips x2 (first words only)", jax.vmap(strips2_fn), words, order)

    def compare_fn(strip):
        m = jnp.zeros(N, jnp.int32)
        for j in range(1, 3):
            sh = jnp.concatenate([jnp.full(j, -1, strip.dtype), strip[:-j]])
            diff = (strip ^ sh).astype(jnp.uint32)
            m += (diff == 0) + ((diff & 0xFF) == 0)
        return m

    strip0 = words  # any (F, N) int32 array stands in for a strip
    t("compare loop (2 depths, 1 word)", jax.vmap(compare_fn), strip0)

    def scatter_fn(order, vals):
        return jnp.zeros(N, jnp.int32).at[order].set(vals)

    t("scatter back x1", jax.vmap(scatter_fn), order, words)


if __name__ == "__main__":
    main()
