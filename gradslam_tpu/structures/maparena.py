"""Fixed-capacity global map arena (TPU-native core of the SLAM map).

The reference grows its map pointcloud every frame via ragged appends
(gradslam/slam/fusionutils.py:702-721) — impossible under XLA's static
shapes. Here the map is a preallocated arena of capacity CAP with a live
count per batch element; "append" is a masked scatter at
``count + cumsum(new_mask)`` offsets and "filter" is a weight mask. This
arena is also the sharding unit for multi-device runs (points dim sharded
over the mesh).

All functions are pure and jit/scan-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["MapState", "init_map", "map_mask", "append_to_map", "map_to_pointclouds"]


class MapState(NamedTuple):
    """Global map state: a batch of fixed-capacity point arenas.

    Attributes:
        points: (B, CAP, 3) world-frame positions.
        normals: (B, CAP, 3) world-frame normals.
        colors: (B, CAP, 3) RGB.
        ccounts: (B, CAP, 1) confidence counters (the reference's
            ``features`` channel).
        num_points: (B,) int32 live count per batch element.
    """

    points: jnp.ndarray
    normals: jnp.ndarray
    colors: jnp.ndarray
    ccounts: jnp.ndarray
    num_points: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.points.shape[1]


def init_map(batch_size: int, capacity: int, dtype=jnp.float32) -> MapState:
    """Creates an empty map arena."""
    B, C = batch_size, capacity
    return MapState(
        points=jnp.zeros((B, C, 3), dtype),
        normals=jnp.zeros((B, C, 3), dtype),
        colors=jnp.zeros((B, C, 3), dtype),
        ccounts=jnp.zeros((B, C, 1), dtype),
        num_points=jnp.zeros((B,), jnp.int32),
    )


def map_mask(state: MapState) -> jnp.ndarray:
    """(B, CAP) bool mask of live map slots."""
    cap = state.points.shape[1]
    return (
        jnp.arange(cap, dtype=jnp.int32)[None, :] < state.num_points[:, None]
    )


def append_to_map(
    state: MapState,
    new_points: jnp.ndarray,
    new_normals: jnp.ndarray,
    new_colors: jnp.ndarray,
    new_ccounts: jnp.ndarray,
    new_mask: jnp.ndarray,
) -> MapState:
    """Appends masked candidate points to the arena (static shapes).

    Candidates are (B, M, ·) with a (B, M) bool mask selecting which rows
    are real. Each selected row lands at slot
    ``num_points + (cumsum(mask) - 1)``; rows beyond capacity are dropped
    (XLA scatter ``mode=drop``). Equivalent of the reference's ragged
    ``Pointclouds.append_points`` (pointclouds.py:1117) under fusion
    (fusionutils.py:702-721).
    """
    B, M = new_mask.shape
    cap = state.points.shape[1]
    mask_i = new_mask.astype(jnp.int32)
    # target slot for each candidate; invalid rows aimed at `cap` (dropped)
    offsets = jnp.cumsum(mask_i, axis=1) - 1  # (B, M)
    slots = state.num_points[:, None] + offsets
    slots = jnp.where(new_mask, slots, cap)
    slots = jnp.where(slots < cap, slots, cap)  # overflow -> drop

    def scat(dst, src):
        b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, M))
        return dst.at[b_idx, slots].set(src, mode="drop")

    n_added = jnp.sum(mask_i, axis=1)
    new_count = jnp.minimum(state.num_points + n_added, cap)
    return MapState(
        points=scat(state.points, new_points),
        normals=scat(state.normals, new_normals),
        colors=scat(state.colors, new_colors),
        ccounts=scat(state.ccounts, new_ccounts),
        num_points=new_count,
    )


def map_to_pointclouds(state: MapState):
    """Converts the arena into a user-facing :class:`Pointclouds`."""
    from .pointclouds import Pointclouds

    return Pointclouds._from_padded(
        state.points,
        state.normals,
        state.colors,
        state.ccounts,
        state.num_points,
    )
