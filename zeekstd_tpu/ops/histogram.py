"""Histograms on device: byte and code frequency counts feeding the entropy
table builders (Huffman weights, FSE normalized counts)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def byte_histogram(data, n_valid=None, nbins: int = 256):
    """Counts of each byte value in data[:n_valid]. data: uint8[N]."""
    data = data.astype(jnp.int32)
    if n_valid is not None:
        weights = (jnp.arange(data.shape[0]) < n_valid).astype(jnp.int32)
    else:
        weights = jnp.ones_like(data)
    return jnp.zeros(nbins, jnp.int32).at[data].add(weights)


byte_histogram_jit = jax.jit(byte_histogram, static_argnames=("nbins",))


def code_histograms(ll_codes, ml_codes, of_codes, n_valid):
    """Histograms of the three sequence-code streams in one pass."""
    valid = jnp.arange(ll_codes.shape[0]) < n_valid
    w = valid.astype(jnp.int32)
    ll_h = jnp.zeros(36, jnp.int32).at[jnp.clip(ll_codes, 0, 35)].add(w)
    ml_h = jnp.zeros(53, jnp.int32).at[jnp.clip(ml_codes, 0, 52)].add(w)
    of_h = jnp.zeros(32, jnp.int32).at[jnp.clip(of_codes, 0, 31)].add(w)
    return ll_h, ml_h, of_h
