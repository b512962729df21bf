"""Sequence execution on TPU: LZ77 copies as pointer-doubling gathers.

The host decoder executes sequences byte-serially (codec/sequences.py
``execute_sequences``; the reference delegates to libzstd's sequential C).
On TPU we exploit that every output byte is either a literal or a copy of
an earlier output byte at a *known* distance:

    src(p) = p            if p is inside a literal run
    src(p) = p - off_i    if p is inside match i

``src`` is idempotent on literals, so iterating ``S <- S[S]`` (pointer
doubling) converges to a map from every output position to the literal
position that ultimately supplies its byte. Two structural facts make the
pass count small and the gathers cheap on this hardware:

- **Modulo collapse**: within one match segment [M, M+ml) at offset o,
  iterating ``p -> p-o`` stays in the segment until it exits below M; the
  exit lands at ``(p - M) mod o + M - o`` in closed form. Starting from
  the collapsed map, each doubling pass squares the number of *segments*
  crossed, so ceil(log2(match nesting depth)) passes suffice — overlapping
  RLE-style runs (off=1, ml=1M) resolve in ONE step instead of log2(bytes)
  passes.
- **Per-index gather cost**: the per-position segment fields (start, ll,
  off, lit_start) are fetched as ONE (nseq, 4) row gather instead of four
  1-D gathers, and the segment id comes from a scatter + running max
  instead of a log-depth searchsorted (each searchsorted round is itself
  a full-size gather).

Static shapes throughout (out_bound, seq_bound are padded compile-time
bounds) so XLA can tile; vmap over frames for multi-frame batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Doubling passes over the *collapsed* map: supports match-nesting chains
# up to 2^N_DOUBLINGS segments deep. Nesting depth is bounded by how many
# times a match can copy from inside another match's output — empirically
# < 32 even on pathological inputs, and 2^12 = 4096 is far beyond any
# block's worst case. ``execute_sequences_tpu`` also returns a convergence
# flag so callers can verify (tpu_codec falls back to the host decoder on
# the never-observed miss).
N_DOUBLINGS = 12


def build_sequence_layout(lls, mls, offs, out_bound: int):
    """Per-output-position layout from per-sequence (ll, ml, offset).

    Padding sequences must have ll=0, ml=0 (zero-length segments are
    naturally skipped). Returns (src, lit_idx, is_lit):
      src[p]     — collapsed source position for p (p itself for literals):
                   already outside p's own match segment (modulo collapse)
      lit_idx[p] — index into the literal stream when is_lit[p]
      is_lit[p]  — whether p takes a literal byte
    """
    lls = lls.astype(jnp.int32)
    mls = mls.astype(jnp.int32)
    offs = offs.astype(jnp.int32)
    nseq = lls.shape[0]

    seq_out = lls + mls
    starts = jnp.cumsum(seq_out) - seq_out  # exclusive
    lit_starts = jnp.cumsum(lls) - lls

    # Rightmost segment whose start <= p (zero-length padding collapses):
    # scatter-add one per segment start, then the prefix count minus one is
    # exactly searchsorted(side="right") - 1 (ties at equal starts resolve
    # to the largest index because every tied start adds to the count).
    # NOT scatter-max + associative_scan(maximum): that formulation sends
    # the TPU compiler into a ~45-minute compile at out_bound = 2^20,
    # while scatter-add + cumsum (a native prefix-sum window op) compiles
    # in seconds.
    p = jnp.arange(out_bound, dtype=jnp.int32)
    # mode="drop" (not clip): trailing zero-length padding segments whose
    # start equals out_bound must not add to the last slot's count.
    counts = jnp.zeros(out_bound, jnp.int32).at[starts].add(1, mode="drop")
    i = jnp.clip(jnp.cumsum(counts) - 1, 0, nseq - 1)

    # One row gather for all per-position segment fields.
    fields = jnp.stack([starts, lls, offs, lit_starts], axis=1)  # (nseq, 4)
    f = fields[i]
    start_i, ll_i, off_i, lit_start_i = f[:, 0], f[:, 1], f[:, 2], f[:, 3]

    within = p - start_i
    is_lit = within < ll_i
    # Modulo collapse: exit the whole match segment in one step.
    m = start_i + ll_i  # match start
    o = jnp.maximum(off_i, 1)
    src = jnp.where(is_lit, p, (p - m) % o + m - o)
    # Guard padding region: clamp into range so gathers stay in bounds.
    src = jnp.clip(src, 0, out_bound - 1)
    lit_idx = lit_start_i + jnp.minimum(within, jnp.maximum(ll_i - 1, 0))
    return src, lit_idx, is_lit


def resolve_copy_chains(src, n_doublings: int | None = None):
    """Pointer-double ``src`` until every position maps to a literal
    (a fixed point). Over the collapsed map each pass squares the number
    of match *segments* a chain can cross. Unrolled — a fori_loop body
    with a gather lowers ~100x slower on this hardware."""
    if n_doublings is None:
        n_doublings = N_DOUBLINGS
    for _ in range(n_doublings):
        src = src[src]
    return src


def execute_sequences_tpu(
    literals, lls, mls, offs, out_bound: int, n_doublings: int | None = None
):
    """Decode one frame's sequences entirely on device.

    literals: uint8[lit_bound]; lls/mls/offs: int32[seq_bound] (padded with
    zeros; trailing literals are passed as a final sequence with ml=0).
    Returns (out uint8[out_bound], converged bool); the caller slices the
    valid prefix and may verify convergence (chains deeper than
    2^n_doublings segments leave non-literal sources — tpu_archive
    escalates to a deeper program, then to the host decoder).

    Every full-size gather costs ~5-10ms per 1M positions on this
    hardware, so the pass count IS the runtime: lit_idx and is_lit ride
    one packed gather, and callers pick n_doublings by expected nesting
    depth (text rarely nests deeper than a few segments).
    """
    src, lit_idx, is_lit = build_sequence_layout(lls, mls, offs, out_bound)
    final = resolve_copy_chains(src, n_doublings)
    total = jnp.sum(lls + mls)
    in_range = jnp.arange(out_bound, dtype=jnp.int32) < total
    # One gather for (lit_idx, is_lit) at the resolved position.
    packed = (lit_idx << 1) | is_lit.astype(jnp.int32)
    pf = packed[final]
    converged = jnp.all(jnp.logical_or((pf & 1).astype(bool), ~in_range))
    take = jnp.clip(pf >> 1, 0, literals.shape[0] - 1)
    return literals[take], converged


execute_sequences_tpu_jit = jax.jit(
    execute_sequences_tpu, static_argnames=("out_bound", "n_doublings")
)


def execute_sequences_batch(
    literals, lls, mls, offs, out_bound: int, n_doublings: int | None = None
):
    """vmapped multi-frame variant: leading axis = frames. Returns
    (out uint8[frames, out_bound], converged bool[frames])."""
    return jax.vmap(
        lambda l, a, b, c: execute_sequences_tpu(l, a, b, c, out_bound, n_doublings)
    )(literals, lls, mls, offs)
