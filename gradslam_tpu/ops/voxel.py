"""Voxel-grid point merging (static-shape, jittable).

Merges points that fall into the same voxel cell into a single
confidence-weighted point. Two uses in the framework:

  - **Cross-chunk map dedup** for sequence-parallel SLAM
    (parallel/seqpar.py): chunk-local maps observe the same surface at
    their seams; merging by voxel removes the duplicates, the same effect
    as PointFusion's projective association but without requiring a
    camera (chunks see the seam from different frames).
  - **Arena overflow policy**: near-duplicate map points (e.g. from
    association misses) can be merged in place to reclaim arena slots,
    complementing ccount-based eviction (structures/maparena.compact_map).

The reference has no voxel tooling (its map grows unboundedly,
gradslam/slam/fusionutils.py:702-721); this is net-new, TPU-first scope:
one multi-key ``lax.sort`` + segment reductions, no data-dependent shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["voxel_merge_rows", "voxel_merge"]


def _sort_by_voxel(pts: jnp.ndarray, live: jnp.ndarray, voxel_size, origin):
    """Per-item voxel keys and sort permutation.

    Returns (perm, boundary) where ``perm`` sorts rows by voxel cell with
    dead rows last, and ``boundary[i]`` marks the first row of each cell
    in sorted order.
    """
    N = pts.shape[0]
    v = jnp.floor((pts - origin) / voxel_size).astype(jnp.int32)
    big = jnp.int32(2**30)
    vx = jnp.where(live, v[:, 0], big)
    vy = jnp.where(live, v[:, 1], big)
    vz = jnp.where(live, v[:, 2], big)
    rowix = jnp.arange(N, dtype=jnp.int32)
    # rowix as a 4th KEY: equal cells order by ascending row — identical
    # to the default stable sort, minus its iota tie-break operand
    sx, sy, sz, perm = jax.lax.sort(
        (vx, vy, vz, rowix), num_keys=4, is_stable=False
    )
    same = (
        (sx[1:] == sx[:-1]) & (sy[1:] == sy[:-1]) & (sz[1:] == sz[:-1])
    )
    boundary = jnp.concatenate([jnp.ones((1,), bool), ~same])
    return perm, boundary


def voxel_merge_rows(
    rows: jnp.ndarray,
    live: jnp.ndarray,
    voxel_size: float,
    origin: Optional[jnp.ndarray] = None,
    normalize_normals: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merges packed arena rows sharing a voxel into weighted averages.

    Args:
        rows: (B, N, C) packed rows with channels
            ``[points(0:3), normals(3:6), colors(6:9), ccounts(9:10), ...]``
            (structures/maparena.py layout).
        live: (B, N) bool mask of valid rows.
        voxel_size: cell edge length (same units as points).
        origin: optional (3,) grid origin (default 0).
        normalize_normals: re-normalize merged normals to unit length.

    Returns:
        (merged_rows, merged_live): (B, N, C) rows compacted to the front
        (one per occupied voxel, confidence-weighted: position/normal/color
        are ccount-weighted means, ccount is the cell sum) and the (B, N)
        validity mask. Rows beyond the merged count are zero.
    """
    if origin is None:
        origin = jnp.zeros((3,), rows.dtype)

    def per_item(rows_b, live_b):
        N, C = rows_b.shape
        perm, boundary = _sort_by_voxel(
            rows_b[:, 0:3], live_b, voxel_size, origin
        )
        rs = rows_b[perm]  # (N, C) one row gather
        ls = live_b[perm]
        seg = jnp.cumsum(boundary.astype(jnp.int32)) - 1  # (N,)

        cc = jnp.where(ls, rs[:, 9], 0.0)[:, None]  # (N, 1) weights
        vals = jnp.concatenate([rs[:, 0:9] * cc, cc], axis=-1)  # (N, 10)

        # Per-cell sums WITHOUT segment_sum: cells are contiguous runs
        # after the sort, so a segmented inclusive scan (value resets at
        # each boundary flag — the classic flag/value operator) leaves
        # each cell's total at its LAST row. segment_sum is a scatter-add
        # at ~45 ns per source row (~30 ms/item at ScanNet capacities —
        # measured to dominate the whole compaction); the scan plus one
        # s32 scatter and one row gather replaces it at a fraction of the
        # cost. Summation stays within-cell (no whole-arena cumsum), so
        # there is no f32 cancellation. Written as an explicit
        # Hillis-Steele log-shift loop with STATIC pads — XLA fuses each
        # level into one elementwise pass; ``lax.associative_scan``'s
        # odd/even lowering measured 2x SLOWER than the scatter here.
        scan_vals, f = vals, boundary
        d = 1
        while d < N:
            vs = jnp.pad(scan_vals[:-d], ((d, 0), (0, 0)))
            fs = jnp.pad(f[:-d], (d, 0), constant_values=True)
            scan_vals = scan_vals + jnp.where(f[:, None], 0.0, vs)
            f = f | fs
            d *= 2
        rowix = jnp.arange(N, dtype=jnp.int32)
        last = jnp.concatenate([boundary[1:], jnp.ones((1,), bool)])
        # last row index of cell s, via one s32 scatter (dead-tail cells
        # land past n_cells and are masked off below)
        last_of_seg = jnp.zeros((N,), jnp.int32).at[
            jnp.where(last, seg, N)
        ].set(rowix, mode="drop")
        sums = scan_vals[last_of_seg]  # (N, 10) one row gather
        wsum = sums[:, 9:10]
        denom = jnp.where(wsum > 0, wsum, 1.0)
        attrs = sums[:, 0:9] / denom  # (N, 9) merged point/normal/color
        if normalize_normals:
            # Both the divide AND the sqrt input are guarded: the norm's
            # backward at an exactly-zero normal (opposing normals
            # cancelling in a cell, or an empty cell) is 0/0 -> NaN even
            # when the forward divide is where-guarded; the guarded-input
            # sqrt keeps the whole VJP finite (found by
            # TestCompactedGrad — the NaN poisoned every upstream depth
            # gradient through the compaction boundary).
            nrm = attrs[:, 3:6]
            nsq = jnp.sum(nrm * nrm, axis=-1, keepdims=True)
            safe = nsq > 0
            nn = jnp.sqrt(jnp.where(safe, nsq, 1.0))
            attrs = attrs.at[:, 3:6].set(
                jnp.where(safe, nrm / nn, nrm)
            )

        n_cells = jnp.sum((boundary & ls).astype(jnp.int32))
        out_live = jnp.arange(N, dtype=jnp.int32) < n_cells
        out = jnp.concatenate(
            [
                attrs,
                wsum,
                jnp.zeros((N, C - 10), rows_b.dtype),
            ],
            axis=-1,
        )
        # segments are already contiguous-front in sorted order (dead rows
        # sort last), so row i of the output is segment i directly
        return jnp.where(out_live[:, None], out, 0.0), out_live

    return jax.vmap(per_item)(rows, live)


def voxel_merge(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    colors: jnp.ndarray,
    ccounts: jnp.ndarray,
    live: jnp.ndarray,
    voxel_size: float,
    origin: Optional[jnp.ndarray] = None,
):
    """Attribute-array wrapper of :func:`voxel_merge_rows`.

    Args:
        points/normals/colors: (B, N, 3); ccounts: (B, N, 1); live: (B, N).

    Returns:
        (points, normals, colors, ccounts, live) with one row per occupied
        voxel, compacted to the front.
    """
    from ..structures.maparena import pack_rows

    rows = pack_rows(points, normals, colors, ccounts)
    merged, out_live = voxel_merge_rows(rows, live, voxel_size, origin)
    return (
        merged[..., 0:3],
        merged[..., 3:6],
        merged[..., 6:9],
        merged[..., 9:10],
        out_live,
    )
