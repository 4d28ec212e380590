"""Masked-compaction utilities (static-shape replacements for ragged ops)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["compact_masked"]

# TPU scatters cost ~4.6 ns per processed source row, so the cumsum+scatter
# compaction walks all N rows at that rate. Above this size the
# sort-formulated variant (per-block stable sort + compare-sum block
# lookup + one small gather) is ~45% faster on TPU.
_SORTED_MIN_N = 32768
_SORTED_BLOCK = 2048


def compact_masked(mask: jnp.ndarray, out_size: int, method: str = "auto"):
    """Compacts the True positions of a (B, N) mask into a fixed-size buffer.

    Replaces data-dependent ``nonzero``/boolean indexing under jit: selected
    indices land in order at the front of an (B, out_size) index buffer.
    When more than ``out_size`` entries are selected, the lowest-index ones
    win (deterministic drop).

    Args:
        mask: (B, N) bool.
        out_size: buffer length.
        method: 'scatter' (cumsum-addressed scatter), 'sort' (per-block
            stable sort — faster on TPU for large N), or 'auto'.

    Returns:
        (indices, valid): (B, out_size) int32 gather indices (0 where
        invalid) and (B, out_size) bool validity. Both methods produce
        identical results.
    """
    if method == "auto":
        method = "sort" if mask.shape[1] >= _SORTED_MIN_N else "scatter"
    if method == "sort":
        return _compact_masked_sorted(mask, out_size)
    return _compact_masked_scatter(mask, out_size)


def _compact_masked_scatter(mask: jnp.ndarray, out_size: int):
    """Cumsum-addressed scatter formulation (cost: ~4.6 ns per mask row)."""
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


def _compact_masked_sorted(
    mask: jnp.ndarray, out_size: int, block: int = _SORTED_BLOCK
):
    """Sort-formulated compaction (no full-length scatter).

    Stages: (1) per-block stable sort moves each block's selected
    positions to its front in original order; (2) each output slot finds
    its (block, rank) by compare-summing the exclusive block-count prefix
    sums — a dense reduction, no gather; (3) one (B, out_size) element
    gather reads the final index. Output is identical to the scatter
    formulation (stable first-K-in-order semantics).
    """
    B, N = mask.shape
    NB = -(-N // block)
    if NB * block != N:
        mask = jnp.pad(mask, ((0, 0), (0, NB * block - N)))
    m = mask.reshape(B, NB, block)
    s_b = jnp.sum(m, axis=-1, dtype=jnp.int32)  # (B, NB) per-block counts
    offs = jnp.cumsum(s_b, axis=-1) - s_b  # exclusive prefix (B, NB)

    key = (~m).astype(jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(block, dtype=jnp.int32), m.shape)
    # (key, pos) with pos as a second KEY: equal keys order by ascending
    # original position — identical to the stable sort, minus the iota
    # tie-break operand XLA adds for is_stable
    _, idx_sorted = jax.lax.sort(
        (key, pos), dimension=-1, num_keys=2, is_stable=False
    )

    # Each output slot j belongs to the LAST block whose exclusive prefix
    # offs_k <= j (empty blocks share a start position with their
    # successor and lose the tie). Instead of O(NB * out_size) dense
    # compare-sums, scatter per-block marks/deltas at the block-start
    # positions (NB-row s32 scatters — tiny) and cumsum over the output
    # axis: cumsum(ones at offs) - 1 = block id; cumsum(deltas of offs at
    # offs) = offs[blk_j] (duplicate starts carry delta 0, so adds stay
    # exact). Measured ~0.5 -> ~0.06 ms at the bench point.
    j = jnp.arange(out_size, dtype=jnp.int32)  # (out_size,)
    bi = jnp.broadcast_to(jnp.arange(B)[:, None], (B, NB))
    pos = jnp.minimum(offs, out_size)  # blocks starting past out drop
    marks = (
        jnp.zeros((B, out_size + 1), jnp.int32).at[bi, pos].add(1)
    )[:, :out_size]
    blk_j = jnp.cumsum(marks, axis=1) - 1  # (B, out_size)
    delta = jnp.diff(offs, axis=1, prepend=0)  # (B, NB), >= 0
    doff = (
        jnp.zeros((B, out_size + 1), jnp.int32).at[bi, pos].add(delta)
    )[:, :out_size]
    off_j = jnp.cumsum(doff, axis=1)  # offs[blk_j] without a gather
    r = j[None, :] - off_j

    # overflow slots (masked below) may index past the end; clamp for safety
    addr = jnp.clip(blk_j * block + r, 0, NB * block - 1)
    # Read the final index with WIDTH-8 row gathers + a one-hot select
    # instead of single-element gathers: element gathers cost ~10.6 ns
    # each but row gathers ~5 ns per row regardless of small widths, and
    # the select math is dense (measured: -30% on the whole compaction
    # at CAP=192k).
    G = 8
    if block % G:  # custom block sizes: plain element gather
        within = jnp.take_along_axis(
            idx_sorted.reshape(B, NB * block), addr, axis=1
        )
    else:
        rows8 = idx_sorted.reshape(B, (NB * block) // G, G)
        wide = jnp.take_along_axis(rows8, (addr // G)[..., None], axis=1)
        within = jnp.sum(
            wide
            * (
                jnp.arange(G, dtype=jnp.int32)[None, None, :]
                == (addr % G)[..., None]
            ),
            axis=-1,
            dtype=jnp.int32,
        )
    out = blk_j * block + within

    count = jnp.minimum(jnp.sum(mask, axis=1), out_size)
    valid = j[None, :] < count[:, None]
    return jnp.where(valid, out, 0), valid
