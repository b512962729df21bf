"""Parallel bitstream assembly: prefix-sum offsets + scatter-or into words.

The host BitWriter (codec/bitstream.py) appends values LSB-first with a
sequential carry of the bit position. On TPU the same stream is produced
with no sequential dependency: every value's absolute bit offset is the
exclusive prefix sum of the bit lengths, and each value contributes to at
most two 32-bit words. Bit positions are written exactly once, so
scatter-ADD equals scatter-OR and XLA's native scatter applies.

This powers Huffman literal encoding (codes are independent per byte) and
the FSE sequence bitstream (state chains come from a scan; the bits are
then placed in parallel here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_bits(values, nbits, word_bound: int):
    """Pack ``values[i]`` (low ``nbits[i]`` bits, LSB-first stream order)
    into a uint32 word array.

    values: uint32[N] (only low nbits matter; nbits=0 entries contribute
    nothing). nbits: int32[N]. word_bound: static output length in words.
    Returns (words uint32[word_bound], total_bits int32).
    """
    values = values.astype(jnp.uint32)
    nbits = nbits.astype(jnp.int32)
    mask = (
        jnp.where(
            nbits >= 32,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << nbits.astype(jnp.uint32)) - jnp.uint32(1),
        )
    )
    values = values & mask

    offsets = jnp.cumsum(nbits) - nbits  # exclusive prefix sum
    total_bits = jnp.sum(nbits)

    w = (offsets >> 5).astype(jnp.int32)
    sh = (offsets & 31).astype(jnp.uint32)

    lo = values << sh  # uint32 wrap drops the straddle bits
    hi = jnp.where(sh == 0, jnp.uint32(0), values >> (jnp.uint32(32) - sh))

    words = jnp.zeros(word_bound, jnp.uint32)
    words = words.at[jnp.clip(w, 0, word_bound - 1)].add(lo)
    words = words.at[jnp.clip(w + 1, 0, word_bound - 1)].add(hi)
    return words, total_bits


pack_bits_jit = jax.jit(pack_bits, static_argnames=("word_bound",))


def words_to_stream(words, total_bits) -> bytes:
    """Host-side: finalize a backward-readable stream — append the sentinel
    bit and byte-align (mirrors BitWriter.finish())."""
    import numpy as np

    words = np.asarray(words, dtype="<u4")
    total_bits = int(total_bits)
    raw = words.tobytes()
    nbytes = (total_bits + 7) // 8
    buf = bytearray(raw[: nbytes + 1])
    while len(buf) < nbytes + 1:
        buf.append(0)
    # Sentinel: one 1-bit at position total_bits.
    buf[total_bits // 8] |= 1 << (total_bits % 8)
    return bytes(buf[: total_bits // 8 + 1])
