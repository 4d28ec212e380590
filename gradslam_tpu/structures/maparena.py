"""Fixed-capacity global map arena (TPU-native core of the SLAM map).

The reference grows its map pointcloud every frame via ragged appends
(gradslam/slam/fusionutils.py:702-721) — impossible under XLA's static
shapes. Here the map is a preallocated arena of capacity CAP with a live
count per batch element; "append" is a masked scatter at
``count + cumsum(new_mask)`` offsets and "filter" is a weight mask. This
arena is also the sharding unit for multi-device runs (points dim sharded
over the mesh).

Storage layout: ONE packed (B, CAP, 12) array with channels
``[points(0:3), normals(3:6), colors(6:9), ccounts(9:10), label(10),
label_conf(11)]`` — the last two channels carry an optional semantic
label id and its streaming-majority confidence (zero when label fusion
is unused).
Random-index gathers/scatters on TPU cost per *row* touched, so packing
all attributes into one row makes every arena update a single scatter and
every arena lookup a single gather (4x fewer slow ops than per-attribute
arrays). The ``points``/``normals``/``colors``/``ccounts`` properties are
zero-copy slices.

All functions are pure and jit/scan-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "MapState",
    "init_map",
    "map_mask",
    "append_to_map",
    "compact_map",
    "voxel_compact_map",
    "map_to_pointclouds",
]

_CH = 12  # packed row width
_PT, _NR, _CO, _CC = slice(0, 3), slice(3, 6), slice(6, 9), slice(9, 10)


class MapState(NamedTuple):
    """Global map state: a batch of fixed-capacity packed point arenas.

    Attributes:
        data: (B, CAP, 12) packed rows
            ``[points, normals, colors, ccounts, pad]``.
        num_points: (B,) int32 live count per batch element.

    Access attributes through the ``points`` / ``normals`` / ``colors`` /
    ``ccounts`` properties (zero-copy slices).
    """

    data: jnp.ndarray
    num_points: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.data.shape[1]

    @property
    def points(self) -> jnp.ndarray:
        return self.data[..., _PT]

    @property
    def normals(self) -> jnp.ndarray:
        return self.data[..., _NR]

    @property
    def colors(self) -> jnp.ndarray:
        return self.data[..., _CO]

    @property
    def ccounts(self) -> jnp.ndarray:
        return self.data[..., _CC]

    @property
    def labels(self) -> jnp.ndarray:
        """(B, CAP) semantic label ids (float storage of ints; 0 when
        label fusion is unused)."""
        return self.data[..., 10]

    @property
    def label_conf(self) -> jnp.ndarray:
        """(B, CAP) streaming-majority label confidence."""
        return self.data[..., 11]

    @classmethod
    def from_arrays(cls, points, normals, colors, ccounts, num_points):
        """Packs separate attribute arrays into arena layout."""
        B, cap = points.shape[:2]
        pad = jnp.zeros((B, cap, _CH - 10), dtype=points.dtype)
        data = jnp.concatenate([points, normals, colors, ccounts, pad], -1)
        return cls(data=data, num_points=num_points)


def pack_rows(points, normals, colors, ccounts):
    """Packs (…, 3/3/3/1) attributes into (…, 12) arena rows."""
    pad = jnp.zeros(points.shape[:-1] + (_CH - 10,), dtype=points.dtype)
    return jnp.concatenate([points, normals, colors, ccounts, pad], -1)


def init_map(batch_size: int, capacity: int, dtype=jnp.float32) -> MapState:
    """Creates an empty map arena."""
    return MapState(
        data=jnp.zeros((batch_size, capacity, _CH), dtype),
        num_points=jnp.zeros((batch_size,), jnp.int32),
    )


def map_mask(state: MapState) -> jnp.ndarray:
    """(B, CAP) bool mask of live map slots."""
    cap = state.capacity
    return (
        jnp.arange(cap, dtype=jnp.int32)[None, :] < state.num_points[:, None]
    )


def append_rows_to_map(
    state: MapState, new_rows: jnp.ndarray, new_mask: jnp.ndarray
) -> MapState:
    """Appends packed (B, M, 12) candidate rows under a (B, M) mask.

    Selected rows land in order at slots ``num_points + cumsum(mask) - 1``;
    rows beyond capacity are dropped.

    Appends target a CONTIGUOUS destination range, so instead of an
    expensive random scatter (TPU scatter costs ~0.1us per row) this
    compacts the selected rows to the front with one gather, then writes a
    single dynamic-slice window at the live-count offset — bandwidth-speed
    instead of row-at-a-time.
    """
    B, M = new_mask.shape
    cap = state.capacity
    mask_i = new_mask.astype(jnp.int32)
    n_added = jnp.sum(mask_i, axis=1)  # (B,)

    if cap < M:
        # tiny arena fallback: plain scatter
        offsets = jnp.cumsum(mask_i, axis=1) - 1
        slots = state.num_points[:, None] + offsets
        slots = jnp.where(new_mask & (slots < cap), slots, cap)
        b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, M))
        data = state.data.at[b_idx, slots].set(new_rows, mode="drop")
        return MapState(
            data=data,
            num_points=jnp.minimum(state.num_points + n_added, cap),
        )

    # compacted source index per candidate slot (stable order)
    pos = jnp.cumsum(mask_i, axis=1) - 1  # (B, M)
    src_of_pos = (
        jnp.zeros((B, M), jnp.int32)
        .at[
            jnp.broadcast_to(jnp.arange(B)[:, None], (B, M)),
            jnp.where(new_mask, pos, M),
        ]
        .set(
            jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None], (B, M)),
            mode="drop",
        )
    )

    # window start: clamp so the M-row window fits; `off` is where inside
    # the window the append begins (non-zero only near overflow)
    start = jnp.clip(state.num_points, 0, cap - M)  # (B,)
    off = state.num_points - start  # (B,)

    # compacted rows up front (batched row gather, no dynamic starts).
    # TRIED AND REJECTED (round 5): splitting this into 8+4-channel
    # gathers (hypothesis: the trace's 14.3 ns/row for this op vs the
    # 5.9 ns/row of same-shaped gathers elsewhere was a 10-channel
    # tiling pathology) — 94.4 -> 89.4 fps at the ScanNet point; the
    # fused roll/select around the gather, not its width, carries the
    # extra cost, and the roll-free formulation was separately rejected
    # (whole-arena layout copies; see append scatter note above).
    rows_c = jnp.take_along_axis(new_rows, src_of_pos[..., None], axis=1)

    # Per-batch dynamic-slice window write, UNROLLED over the (static,
    # small) batch dim: vmap of dynamic_slice/dynamic_update_slice with
    # per-batch starts lowers to a while loop over B carrying full-arena
    # tensors in a transposed layout (measured ~0.3 ms/frame of relayout
    # copies at the bench point); B unrolled slices on the batched array
    # lower to plain dynamic-(update-)slice HLO.
    r = jnp.arange(M, dtype=jnp.int32)
    C = state.data.shape[-1]
    data = state.data
    for b in range(B):
        # shift the compacted rows to the in-window offset with a dynamic
        # roll (two contiguous copies) instead of an element gather at
        # shifted indices (~10.6 ns/element); rows at r < off_b wrap
        # around but are masked out by `sel` below
        rows_rolled = jnp.roll(rows_c[b], off[b], axis=0)
        window = jax.lax.dynamic_slice(data, (b, start[b], 0), (1, M, C))
        sel = (r >= off[b]) & (r < off[b] + n_added[b])
        new_win = jnp.where(sel[None, :, None], rows_rolled[None], window)
        data = jax.lax.dynamic_update_slice(data, new_win, (b, start[b], 0))
    return MapState(
        data=data, num_points=jnp.minimum(state.num_points + n_added, cap)
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

    Equivalent of the reference's ragged ``Pointclouds.append_points``
    (pointclouds.py:1117) under fusion (fusionutils.py:702-721).
    """
    rows = pack_rows(new_points, new_normals, new_colors, new_ccounts)
    return append_rows_to_map(state, rows, new_mask)


def compact_map(
    state: MapState,
    min_ccount: float = 0.0,
    keep_recent: int = 0,
) -> MapState:
    """Defragments the arena, evicting low-confidence points.

    Keeps points with ``ccounts >= min_ccount`` plus the ``keep_recent``
    most recently appended points (which have not yet had a chance to
    accumulate confidence), compacted to the front of the arena. This is
    the overflow policy for long runs: call periodically (host level, or
    on a capacity watermark) to reclaim slots from unstable points —
    the fixed-capacity analogue of PointFusion's unstable-point removal
    (Keller et al. 2013 §4.3).

    Pure and jittable; order of surviving points is preserved.
    """
    cap = state.capacity
    live = map_mask(state)
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]
    recent = idx >= (state.num_points[:, None] - keep_recent)
    keep = live & ((state.ccounts[..., 0] >= min_ccount) | recent)

    from ..ops.masking import compact_masked

    take_idx, valid = compact_masked(keep, cap)
    data = jnp.take_along_axis(state.data, take_idx[..., None], axis=1)
    data = data * valid[..., None].astype(data.dtype)
    return MapState(
        data=data, num_points=jnp.sum(keep, axis=1).astype(jnp.int32)
    )


def voxel_compact_map(state: MapState, voxel_size: float) -> MapState:
    """Merges map points sharing a voxel cell, reclaiming arena slots.

    The complementary overflow policy to :func:`compact_map`: instead of
    evicting low-confidence points, near-duplicate points (same
    ``voxel_size`` cell) collapse into one confidence-weighted point whose
    ccount is the cell sum — no observations are discarded. Useful when
    association misses have inflated the arena with co-located duplicates.

    Pure and jittable; surviving rows are compacted to the front (sorted
    by voxel cell, not by original order).
    """
    from ..ops.voxel import voxel_merge_rows

    merged, live = voxel_merge_rows(state.data, map_mask(state), voxel_size)
    return MapState(
        data=merged, num_points=jnp.sum(live, axis=1).astype(jnp.int32)
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
