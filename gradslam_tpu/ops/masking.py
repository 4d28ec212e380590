"""Masked-compaction utilities (static-shape replacements for ragged ops)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["compact_masked"]


def compact_masked(mask: jnp.ndarray, out_size: int):
    """Compacts the True positions of a (B, N) mask into a fixed-size buffer.

    Replaces data-dependent ``nonzero``/boolean indexing under jit: selected
    indices land in order at the front of an (B, out_size) index buffer via
    a cumsum-addressed scatter. When more than ``out_size`` entries are
    selected, the lowest-index ones win (deterministic drop).

    Returns:
        (indices, valid): (B, out_size) int32 gather indices (0 where
        invalid) and (B, out_size) bool validity.
    """
    B, N = mask.shape
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1  # (B, N)
    slots = jnp.where(mask & (pos < out_size), pos, out_size)
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, N))
    src_idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (B, N))
    buf = jnp.zeros((B, out_size), dtype=jnp.int32)
    buf = buf.at[b_idx, slots].set(src_idx, mode="drop")
    count = jnp.minimum(jnp.sum(mask, axis=1), out_size)
    valid = (
        jnp.arange(out_size, dtype=jnp.int32)[None, :] < count[:, None]
    )
    return buf, valid
