"""Sequence execution on TPU: LZ77 copies as pointer-doubling gathers.

The host decoder executes sequences byte-serially (codec/sequences.py
``execute_sequences``; the reference delegates to libzstd's sequential C).
On TPU we exploit that every output byte is either a literal or a copy of
an earlier output byte at a *known* distance:

    src(p) = p            if p is inside a literal run
    src(p) = p - off_i    if p is inside match i

``src`` is idempotent on literals, so iterating ``S <- S[S]`` (pointer
doubling) converges in ceil(log2(longest copy chain)) passes to a map from
every output position to the literal position that ultimately supplies its
byte. The whole decode is then ~20 vectorized gathers — no sequential
dependency on the match copies at all, which is what makes multi-GiB/s
decode possible on a vector machine.

Static shapes throughout (out_bound, seq_bound are padded compile-time
bounds) so XLA can tile; vmap over frames for multi-frame batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_sequence_layout(lls, mls, offs, out_bound: int):
    """Per-output-position layout from per-sequence (ll, ml, offset).

    Padding sequences must have ll=0, ml=0 (zero-length segments are
    naturally skipped). Returns (src, lit_idx, is_lit):
      src[p]     — source position for p (p itself for literals)
      lit_idx[p] — index into the literal stream when is_lit[p]
      is_lit[p]  — whether p takes a literal byte
    """
    lls = lls.astype(jnp.int32)
    mls = mls.astype(jnp.int32)
    offs = offs.astype(jnp.int32)

    seq_out = lls + mls
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(seq_out)])
    lit_starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(lls)])

    p = jnp.arange(out_bound, dtype=jnp.int32)
    # Rightmost segment whose start <= p (zero-length padding collapses).
    i = jnp.searchsorted(starts, p, side="right").astype(jnp.int32) - 1
    i = jnp.clip(i, 0, lls.shape[0] - 1)
    within = p - starts[i]
    is_lit = within < lls[i]
    src = jnp.where(is_lit, p, p - offs[i])
    # Guard padding region: clamp into range so gathers stay in bounds.
    src = jnp.clip(src, 0, out_bound - 1)
    lit_idx = lit_starts[i] + jnp.minimum(within, jnp.maximum(lls[i] - 1, 0))
    return src, lit_idx, is_lit


def resolve_copy_chains(src, n_doublings: int | None = None):
    """Pointer-double ``src`` until every position maps to a literal
    (a fixed point). ceil(log2(out_bound)) passes always suffice because a
    copy chain can step back at most out_bound times. Unrolled — a
    fori_loop body with a gather lowers ~100x slower on this hardware."""
    out_bound = src.shape[0]
    if n_doublings is None:
        n_doublings = max((out_bound - 1).bit_length(), 1)
    for _ in range(n_doublings):
        src = src[src]
    return src


def execute_sequences_tpu(literals, lls, mls, offs, out_bound: int):
    """Decode one frame's sequences entirely on device.

    literals: uint8[lit_bound]; lls/mls/offs: int32[seq_bound] (padded with
    zeros; trailing literals are passed as a final sequence with ml=0).
    Returns uint8[out_bound]; the caller slices the valid prefix.
    """
    src, lit_idx, is_lit = build_sequence_layout(lls, mls, offs, out_bound)
    final = resolve_copy_chains(src)
    # final[p] is a literal position; map through its literal index.
    take = lit_idx[final]
    take = jnp.clip(take, 0, literals.shape[0] - 1)
    return literals[take]


execute_sequences_tpu_jit = jax.jit(
    execute_sequences_tpu, static_argnames=("out_bound",)
)


def execute_sequences_batch(literals, lls, mls, offs, out_bound: int):
    """vmapped multi-frame variant: leading axis = frames."""
    return jax.vmap(lambda l, a, b, c: execute_sequences_tpu(l, a, b, c, out_bound))(
        literals, lls, mls, offs
    )
