"""PointFusion association + fusion (TPU-native core).

Parity surface with the reference's fusionutils
(reference: gradslam/slam/fusionutils.py), re-designed for static shapes:

  - The reference emits a ragged ``pc2im_bnhw`` lookup table of active map
    points (fusionutils.py:198-287); here association state is dense —
    per-map-slot masks + pixel indices over the fixed-capacity arena.
  - The reference's per-pixel winner selection via ``torch.unique`` row
    sorting (fusionutils.py:489-536) keeps identical lexicographic
    tie-breaking (max ccount, then min ray distance, then min point
    index): segment reductions in the reference-parity path, one
    multi-key ``lax.sort`` in the fast path (fusion_update_compact).
  - Ragged appends (fusionutils.py:702-721) become masked scatter-appends
    into the arena (structures/maparena.py).

The dense functions are the jit/scan path; thin wrappers at the bottom
reproduce the reference's table-based host API for parity tests.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from ..geometry import (
    inverse_transformation,
    project_points_to_pixels,
    transform_pointcloud,
)
from ..structures.maparena import (
    MapState,
    append_rows_to_map,
    append_to_map,
    map_mask,
)

__all__ = [
    "get_alpha",
    "are_points_close",
    "are_normals_similar",
    "DenseCorrespondence",
    "find_correspondences_dense",
    "fuse_map_dense",
    "aggregate_map_dense",
    "find_active_map_points",
    "find_similar_map_points",
    "find_best_unique_correspondences",
    "find_correspondences",
    "fuse_with_map",
    "update_map_fusion",
    "update_map_aggregate",
]


def get_alpha(
    points: jnp.ndarray,
    sigma: Union[float, jnp.ndarray],
    dim: int = -1,
    keepdim: bool = False,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Sample confidence ``alpha = exp(-|p|^2 / (2 sigma^2))``, clamped to
    ``[eps, 1.01]`` — computed on camera-frame positions.

    Reference parity: gradslam/slam/fusionutils.py:16-73 (Keller et al.
    2013, section 4.1).
    """
    alpha = jnp.exp(-jnp.sum(points**2, axis=dim, keepdims=keepdim) / (2 * sigma**2))
    return jnp.clip(alpha, eps, 1.01)


def are_points_close(t1, t2, dist_th, dim: int = -1):
    """Per-element Euclidean distance threshold (reference :76-130)."""
    return jnp.linalg.norm(t1 - t2, axis=dim) < dist_th


def are_normals_similar(t1, t2, dot_th, dim: int = -1):
    """Per-element dot-product threshold (reference :133-195)."""
    return jnp.sum(t1 * t2, axis=dim) > dot_th


class DenseCorrespondence(NamedTuple):
    """Dense association state over the map arena.

    Attributes:
        winner: (B, CAP) bool — map slot is the unique best correspondence
            for its pixel.
        h, w: (B, CAP) int32 — projected pixel of each map slot (valid only
            where ``active``).
        active: (B, CAP) bool — slot projects inside the live frame.
        pix_corr: (B, H*W) bool — pixel has a corresponding map point.
    """

    winner: jnp.ndarray
    h: jnp.ndarray
    w: jnp.ndarray
    active: jnp.ndarray
    pix_corr: jnp.ndarray


def _project_points_to_frame(points, live, pose, intrinsics, H, W):
    """Core projection: (B, N, 3) points -> pixel rows/cols + active mask.

    Alias of :func:`gradslam_tpu.geometry.project_points_to_pixels` (the
    math moved to the geometry layer so projective-association odometry
    can share it without depending on the slam layer).
    """
    return project_points_to_pixels(points, live, pose, intrinsics, H, W)


def project_map_to_frame(
    map_state: MapState, pose: jnp.ndarray, intrinsics: jnp.ndarray, H: int, W: int
):
    """Projects live map points into the camera at ``pose``.

    Returns:
        (h, w, active): (B, CAP) int32 pixel rows/cols and bool active mask.
    """
    return _project_points_to_frame(
        map_state.points, map_mask(map_state), pose, intrinsics, H, W
    )


def visible_subarena(
    map_state: MapState,
    pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    H: int,
    W: int,
    block_size: int,
    visible_capacity: int,
):
    """Block-gated view of the arena: only blocks whose bounding sphere can
    project into the frame.

    Spatial-partition acceleration for large maps: the arena is treated as
    NB = CAP/block_size contiguous blocks. Per frame: (1) compute block
    centroids/radii (one cheap bandwidth-bound pass over the arena),
    (2) conservatively frustum-test each sphere, (3) gather the visible
    blocks' rows (contiguous block gathers — fast) into a sub-arena of at
    most ``visible_capacity`` blocks. Downstream association then costs
    O(visible) instead of O(CAP).

    Returns:
        (sub_data (B, V*BLK, 12), sub_slots (B, V*BLK) int32 arena slots,
        sub_live (B, V*BLK) bool).
    """
    B = map_state.data.shape[0]
    CAP = map_state.capacity
    BLK = block_size
    NB = -(-CAP // BLK)  # ceil; trailing partial block padded below
    V = visible_capacity

    from ..ops.masking import compact_masked

    live = map_mask(map_state)  # (B, CAP)
    data_full = map_state.data
    pad = NB * BLK - CAP
    if pad:
        data_full = jnp.pad(data_full, ((0, 0), (0, pad), (0, 0)))
        live = jnp.pad(live, ((0, 0), (0, pad)))
    pts = data_full[..., 0:3].reshape(B, NB, BLK, 3)
    lv = live.reshape(B, NB, BLK, 1).astype(pts.dtype)
    n_in_block = jnp.maximum(lv.sum(axis=2), 1.0)  # (B, NB, 1)
    centroid = (pts * lv).sum(axis=2) / n_in_block  # (B, NB, 3)
    radius = jnp.sqrt(
        jnp.max(
            jnp.sum((pts - centroid[:, :, None]) ** 2, -1) * lv[..., 0],
            axis=2,
        )
    )  # (B, NB)
    block_live = live.reshape(B, NB, BLK).any(axis=2)

    # conservative sphere-vs-frustum test in camera space
    tinv = inverse_transformation(pose)
    c_cam = transform_pointcloud(centroid, tinv)  # (B, NB, 3)
    z = c_cam[..., 2]
    K = intrinsics[:, 0] if intrinsics.ndim == 4 else intrinsics
    fx = jnp.abs(K[..., 0, 0])[:, None]
    fy = jnp.abs(K[..., 1, 1])[:, None]
    cx = K[..., 0, 2][:, None]
    cy = K[..., 1, 2][:, None]
    # sphere crossing/behind the image plane -> conservatively visible
    near = z - radius <= 1e-3
    z_safe = jnp.maximum(z - radius, 1e-3)
    u = (c_cam[..., 0] * K[..., 0, 0][:, None] + z * cx) / jnp.where(
        z != 0, z, 1.0
    )
    v = (c_cam[..., 1] * K[..., 1, 1][:, None] + z * cy) / jnp.where(
        z != 0, z, 1.0
    )
    mu = radius * fx / z_safe
    mv = radius * fy / z_safe
    in_view = (
        (u + mu > -1.0)
        & (u - mu < W + 1.0)
        & (v + mv > -1.0)
        & (v - mv < H + 1.0)
        & (z + radius > 0)
    )
    visible = block_live & (in_view | near)

    blk_idx, blk_valid = compact_masked(visible, V)  # (B, V)

    # contiguous block gathers
    data_blk = data_full.reshape(B, NB, BLK, -1)
    sub = jnp.take_along_axis(
        data_blk, blk_idx[:, :, None, None], axis=1
    )  # (B, V, BLK, 12)
    sub_data = sub.reshape(B, V * BLK, data_blk.shape[-1])
    sub_slots = (
        blk_idx[:, :, None] * BLK
        + jnp.arange(BLK, dtype=jnp.int32)[None, None, :]
    ).reshape(B, V * BLK)
    live_blk = live.reshape(B, NB, BLK)
    sub_live = jnp.take_along_axis(
        live_blk, blk_idx[:, :, None], axis=1
    ).reshape(B, V * BLK)
    sub_live = sub_live & blk_valid[:, :, None].repeat(BLK, axis=2).reshape(
        B, V * BLK
    )
    return sub_data, sub_slots, sub_live


def _gather_pixels(img: jnp.ndarray, h: jnp.ndarray, w: jnp.ndarray):
    """Gathers (B, H, W, C) images at per-batch (B, N) pixel indices."""
    B = img.shape[0]
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], h.shape)
    return img[b_idx, h, w]


def find_correspondences_dense(
    map_state: MapState,
    frame_vertex_global: jnp.ndarray,
    frame_normal_global: jnp.ndarray,
    pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    dist_th: float,
    dot_th: float,
) -> DenseCorrespondence:
    """Full projective-association pipeline, dense over the map arena.

    Stages (reference fusionutils.py:549-577):
      1. active: map points projecting into the live frame.
      2. similar: distance + normal-dot gating against the frame maps at
         the projected pixel (zero normals auto-reject invalid depth).
      3. unique winner per pixel: max ccount -> min ray distance -> min
         point index, via segment reductions (exact tie-break parity with
         the reference's ``torch.unique`` row sort, fusionutils.py:489-536).

    Args:
        frame_vertex_global / frame_normal_global: (B, H, W, 3).
        pose: (B, 4, 4) live-frame pose; intrinsics: (B, 1, 4, 4).

    Returns:
        DenseCorrespondence.
    """
    B, H, W, _ = frame_vertex_global.shape
    CAP = map_state.points.shape[1]
    HW = H * W

    h, w, active = project_map_to_frame(map_state, pose, intrinsics, H, W)

    fp = _gather_pixels(frame_vertex_global, h, w)  # (B, CAP, 3)
    fn = _gather_pixels(frame_normal_global, h, w)
    is_close = are_points_close(fp, map_state.points, dist_th)
    is_similar = are_normals_similar(fn, map_state.normals, dot_th)
    gated = active & is_close & is_similar  # (B, CAP)

    pix = h * W + w  # (B, CAP)
    pix_seg = jnp.where(gated, pix, HW)  # dump rejected slots in segment HW
    ccount = map_state.ccounts[..., 0]  # (B, CAP)
    ray_dist = jnp.sum((map_state.points - fp) ** 2, axis=-1)
    slot_idx = jnp.broadcast_to(
        jnp.arange(CAP, dtype=jnp.int32)[None, :], (B, CAP)
    )

    def per_batch(pix_b, cc_b, rd_b, gated_b, idx_b):
        seg_cc = jax.ops.segment_max(
            jnp.where(gated_b, cc_b, -jnp.inf), pix_b, num_segments=HW + 1
        )
        cand1 = gated_b & (cc_b == seg_cc[pix_b])
        seg_rd = jax.ops.segment_min(
            jnp.where(cand1, rd_b, jnp.inf), pix_b, num_segments=HW + 1
        )
        cand2 = cand1 & (rd_b == seg_rd[pix_b])
        seg_ix = jax.ops.segment_min(
            jnp.where(cand2, idx_b, CAP), pix_b, num_segments=HW + 1
        )
        winner_b = cand2 & (idx_b == seg_ix[pix_b])
        pix_corr_b = seg_ix[:HW] < CAP
        return winner_b, pix_corr_b

    winner, pix_corr = jax.vmap(per_batch)(
        pix_seg, ccount, ray_dist, gated, slot_idx
    )
    return DenseCorrespondence(
        winner=winner, h=h, w=w, active=active, pix_corr=pix_corr
    )


def fuse_map_dense(
    map_state: MapState,
    corr: DenseCorrespondence,
    frame_vertex_global: jnp.ndarray,
    frame_normal_global: jnp.ndarray,
    frame_vertex_local: jnp.ndarray,
    rgb_image: jnp.ndarray,
    valid_depth: jnp.ndarray,
    sigma: float,
) -> MapState:
    """PointFusion map update (reference fusionutils.py:580-722).

    Corresponded map slots get the confidence-weighted running average
    ``p' = (cc p + alpha p_frame) / (cc + alpha)`` (same for normals and
    colors); non-corresponded valid-depth pixels are appended to the arena
    with feature ``alpha``.

    Args:
        frame_*: (B, H, W, 3) maps; frame_vertex_local is camera-frame (for
            alpha); valid_depth: (B, H, W) bool.
    """
    B, H, W, _ = frame_vertex_global.shape
    alpha_img = get_alpha(frame_vertex_local, sigma, keepdim=True)  # (B,H,W,1)

    # --- merge corresponded slots (pure gathers on the map side) -------
    fp = _gather_pixels(frame_vertex_global, corr.h, corr.w)
    fn = _gather_pixels(frame_normal_global, corr.h, corr.w)
    fc = _gather_pixels(rgb_image, corr.h, corr.w)
    fa = _gather_pixels(alpha_img, corr.h, corr.w)  # (B, CAP, 1)

    win = corr.winner[..., None]  # (B, CAP, 1)
    alpha = jnp.where(win, fa, jnp.zeros_like(fa))
    cc = map_state.ccounts
    cc_new = cc + alpha
    inv = 1.0 / jnp.where(cc_new == 0, jnp.ones_like(cc_new), cc_new)

    def merge(old, frame_attr):
        upd = (cc * old + alpha * frame_attr) * inv
        return jnp.where(win, upd, old)

    merged = MapState.from_arrays(
        merge(map_state.points, fp),
        merge(map_state.normals, fn),
        merge(map_state.colors, fc),
        jnp.where(win, cc_new, cc),
        map_state.num_points,
    )

    # --- append non-corresponded valid pixels --------------------------
    new_mask = valid_depth.reshape(B, H * W) & ~corr.pix_corr
    return append_to_map(
        merged,
        frame_vertex_global.reshape(B, H * W, 3),
        frame_normal_global.reshape(B, H * W, 3),
        rgb_image.reshape(B, H * W, 3),
        alpha_img.reshape(B, H * W, 1),
        new_mask,
    )


def _winner_writeback(data, wslots, wvalid, mrows, bw, merge_window):
    """Writes merged winner rows ``mrows`` to arena slots ``wslots``.

    Two bitwise-identical formulations:

    - ``merge_window=None``: one 12-channel row scatter over the winner
      buffer (~45 ns per processed source row — the scatter floor).
    - ``merge_window=Wz``: winners in dense SLAM runs cluster in a small
      slot range (the recently appended / recently merged region), so the
      update can avoid the row scatter entirely: dynamic-slice a Wz-row
      window around the winners, invert the slot map with ONE cheap s32
      scatter (rank per window slot), gather each window row's merge row
      (row gathers are ~9x cheaper than row scatters), select, and write
      the window back contiguously. Falls back to the scatter via
      ``lax.cond`` whenever the winner span exceeds the window (e.g. a
      loop-closure revisit touching very old slots), so results are
      identical for every input.
    """
    CAP = data.shape[1]
    if not merge_window:
        return data.at[bw, wslots].set(mrows, mode="drop")

    B, HW = wslots.shape
    Wz = min(merge_window, CAP)
    lo = jnp.min(jnp.where(wvalid, wslots, CAP), axis=1)  # (B,)
    hi = jnp.max(jnp.where(wvalid, wslots, -1), axis=1) + 1
    start = jnp.maximum(0, jnp.minimum(lo, CAP - Wz))
    fits = jnp.all(hi <= start + Wz)

    def _scatter_wb(operands):
        d, ws, _, mr, _ = operands
        return d.at[bw, ws].set(mr, mode="drop")

    def _window_wb(operands):
        d, ws, wv, mr, st = operands
        rank = jnp.arange(HW, dtype=jnp.int32)
        for b in range(B):
            win = jax.lax.dynamic_slice(
                d, (b, st[b], 0), (1, Wz, d.shape[2])
            )[0]
            dest = jnp.where(wv[b], ws[b] - st[b], Wz)
            inv = (
                jnp.full((Wz + 1,), HW, jnp.int32)
                .at[dest]
                .set(rank, mode="drop")
            )[:Wz]
            rows = jnp.take_along_axis(
                mr[b], jnp.minimum(inv, HW - 1)[:, None], axis=0
            )
            win = jnp.where((inv < HW)[:, None], rows, win)
            d = jax.lax.dynamic_update_slice(d, win[None], (b, st[b], 0))
        return d

    return jax.lax.cond(
        fits, _window_wb, _scatter_wb, (data, wslots, wvalid, mrows, start)
    )


def _resolve_merge_window(merge_window, H: int, W: int, view_rows: int):
    """Resolves the merge_window option (-1 auto, 0/None off, >0 explicit).

    Auto: the windowed winner writeback replaces the H*W-row merge
    scatter (~45 ns/row) with window ops whose fixed overhead is two
    layout copies of the merge TARGET (cost proportional to the target's
    row count — see docs/PERFORMANCE.md). The trade flips as the target
    outgrows the frame: measured 335 vs 296 fps at 10*H*W rows (window
    wins) but 55.7 vs 62.6 fps at 16*H*W (scatter wins). Crossover
    ~12*H*W.
    """
    if merge_window is None or merge_window == 0:
        return None
    if merge_window < 0:
        return 2 * H * W if view_rows <= 12 * H * W else None
    return merge_window


def _resolve_model_rows(mode: str, H: int, W: int, capacity: int) -> bool:
    """Resolves the model_rows option to a bool (dense on/off).

    'dense' builds the projective-odometry target rows (B, H*W, 7)
    densely at fusion time; 'gather' keeps the arena row gather at
    ``model_img`` indices. Auto: dense once the arena outgrows ~12*H*W —
    measured on v5e, the winner/model row gathers run at ~5.5 ns/row
    while the arena fits cache but degrade ~5x (25+ ns/row) at ScanNet
    capacities (1.2M rows, 118 MB planar table, random indices), while
    the dense build's cost (one s32 rank scatter + one H*W row gather
    from the frame-sized mrows table + selects) stays capacity-
    independent.
    """
    if mode == "dense":
        return True
    if mode == "gather":
        return False
    if mode != "auto":
        raise ValueError(
            f"model_rows must be 'dense', 'gather' or 'auto', got {mode!r}"
        )
    return capacity > 12 * H * W


def _resolve_assoc_window(assoc_window, capacity: int):
    """Resolves the assoc_window option (<=0 off, >0 static prefix rows).

    Live arena rows are a contiguous prefix ``[0, num_points)`` (appends
    are contiguous; merges write in place), so association can run on the
    static slice ``data[:, :assoc_window]`` — per-frame cost then scales
    with the configured working-set bound instead of the worst-case
    capacity (the arena analogue of the reference's dynamically grown
    map). Rows at slots >= assoc_window are deterministically excluded
    from association (like ``active_capacity`` overflow: they are not
    merged and the affected pixels may append a duplicate) — size it so
    the expected map fits. A ``lax.cond`` fallback was tried and
    rejected: conditionals over the arena force whole-arena relayout
    copies every frame (measured ~0.8 ms per copy at ScanNet scale, two
    per frame, even on frames taking the cheap branch).
    """
    if assoc_window is None or assoc_window <= 0:
        return None
    return min(assoc_window, capacity) if assoc_window < capacity else None


def _fusion_window_dense(
    map_state: MapState,
    view: jnp.ndarray,
    live: jnp.ndarray,
    frame_attr: jnp.ndarray,
    valid_depth: jnp.ndarray,
    pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    dist_th: float,
    dot_th: float,
    H: int,
    W: int,
    A: int,
    compact: bool,
    has_labels: bool,
    return_active: bool,
    dense_model_rows: bool,
    need_active_set: bool = True,
):
    """Capacity-windowed fusion with a DENSE merge over the view rows.

    Produces bitwise-identical results to the row-compacted window path
    in :func:`fusion_update_compact` (same winners, same merge math, same
    appends — pinned by ``TestDenseWindowMergeEquivalence``), but
    restructured so that per-frame cost is dominated by ONE wide frame
    gather and the winner sort instead of five gathers and three
    scatters. Measured motivation (v5e per-HLO trace at 240x320 / L=16 /
    CAP=1.2M, docs/PERFORMANCE.md round 5):

      - The row path materializes winner rows compactly (``mrows``) and
        writes them back by inverting the slot map: winner-row gather
        (0.85 ms) + winner frame gather (1.95 ms) + rank scatter
        (0.71 ms) + an mrows gather over EVERY view row (3.59 ms) + the
        model-rows carry's rank scatter + gather (1.6 ms).
      - Here the merge result is instead computed DENSELY per view row
        from the row's own attributes and the frame attributes at its
        own projected pixel — the identical math the winner rows would
        compute, valid precisely at winner rows — and selected under the
        winner mask. All five gathers/scatters above collapse into one
        dense elementwise pass plus two sorted-space scatters; the price
        is gathering frame attributes for ALL view rows instead of the
        compacted active set (NT vs A rows).

    Winner masks come straight from SORTED space: winners are the first
    row of each pixel group after the 4-key sort, so one scatter of
    ``slot_sorted`` under the winner mask yields the per-row winner mask,
    and one scatter of it by pixel yields the model image — no
    rank-compacted ``wslots`` buffer at all.
    """
    B, NT, C = view.shape
    CAP = map_state.capacity
    HW = H * W

    from ..ops.masking import compact_masked

    # ---- dense association over the view --------------------------------
    h, w, active = _project_points_to_frame(
        view[..., 0:3], live, pose, intrinsics, H, W
    )
    pix = (h * W + w).astype(jnp.int32)  # (B, NT)
    fa = jnp.take_along_axis(frame_attr, pix[..., None], axis=1)
    fp, fn = fa[..., 0:3], fa[..., 3:6]
    mp, mn = view[..., 0:3], view[..., 3:6]
    gated = (
        active
        & are_points_close(fp, mp, dist_th)
        & are_normals_similar(fn, mn, dot_th)
    )
    ray = jnp.sum((mp - fp) ** 2, axis=-1)  # (B, NT)
    cc1 = view[..., 9]

    # Sort keys, all carried as s32: pix and slot natively; -cc and ray
    # through the monotone IEEE-754 bits map (for non-NaN f32, flipping
    # the magnitude bits of negatives makes signed-int order equal float
    # order; -0.0 maps below +0.0, which never arises here — cc is a sum
    # of non-negative alphas, ray a sum of squares). One dtype lets the
    # compacted path fetch all four keys with ONE 4-channel row gather,
    # and the all-s32 comparator sorts measurably faster than mixed
    # s32/f32 keys (which in turn beat all-f32 by ~25% — measured v5e).
    def _f32_sortable_s32(x):
        m = jax.lax.bitcast_convert_type(x, jnp.int32)
        return jnp.where(m < 0, m ^ jnp.int32(0x7FFFFFFF), m)

    pix_seg = jnp.where(gated, pix, HW)
    slot_iota = jnp.broadcast_to(
        jnp.arange(NT, dtype=jnp.int32)[None, :], (B, NT)
    )
    negcc_i = _f32_sortable_s32(-cc1)
    ray_i = _f32_sortable_s32(ray)
    if compact:
        # Bound the sort to the active buffer. When the caller consumes
        # the compacted set as odometry candidates (need_active_set —
        # the knn/reuse_actives path), compact ACTIVE rows exactly like
        # the row path. Otherwise (projective odometry ignores the
        # carry) compact GATED rows: a non-gated row can never win, so
        # dropping it is free, and the buffer then holds only true
        # candidates — at the ScanNet point the gated count peaks at
        # ~1.3·H·W where actives peak at ~3.8·H·W, so the same A=2·H·W
        # buffer that silently dropped gate-PASSING candidates under
        # active compaction (up to ~140k/frame, each a lost merge and a
        # duplicate append) drops NOTHING under gated compaction:
        # strictly more exact, and the map grows measurably less.
        # Keys are packed 8-wide (4 real + 4 pad): the 8-wide s32 row
        # gather runs at the 5.9 ns/row issue floor while the 4-wide
        # T(4,128) form measured 6.9 ns/row (v5e trace; same trick as
        # masking.py:125).
        idxb, avalid = compact_masked(
            active if need_active_set else gated, A
        )
        zero = jnp.zeros_like(pix_seg)
        keys = jnp.stack(
            [pix_seg, negcc_i, ray_i, slot_iota, zero, zero, zero, zero],
            axis=-1,
        )  # (B, NT, 8)
        kc = jnp.take_along_axis(keys, idxb[..., None], axis=1)
        k_pix = jnp.where(avalid, kc[..., 0], HW)
        k_cc, k_ray, k_slot = kc[..., 1], kc[..., 2], kc[..., 3]
        arena_slot = idxb
    else:
        k_pix, k_cc, k_ray, k_slot = pix_seg, negcc_i, ray_i, slot_iota
        arena_slot = slot_iota
        avalid = active

    pix_sorted, _, _, slot_sorted = jax.vmap(
        lambda p, c, r, s: jax.lax.sort(
            (p, c, r, s), num_keys=4, is_stable=False
        )
    )(k_pix, k_cc, k_ray, k_slot)
    first = jnp.concatenate(
        [
            jnp.ones((B, 1), dtype=bool),
            pix_sorted[:, 1:] != pix_sorted[:, :-1],
        ],
        axis=1,
    )
    winner_sorted = first & (pix_sorted < HW)
    slot_s = slot_sorted
    pix_s = pix_sorted

    # ---- winner masks via two sorted-space scatters ---------------------
    # Both scatters carry s32 payloads: a pred-typed .set(True) scatter
    # here lowers to a sort-based deduplicating expansion on TPU
    # (measured +0.3 ms at the ScanNet point), while the equivalent s32
    # scatter + compare lowers to the plain per-row scatter.
    bsrt = jnp.broadcast_to(jnp.arange(B)[:, None], winner_sorted.shape)
    wmask = (
        jnp.zeros((B, NT + 1), dtype=jnp.int32)
        .at[bsrt, jnp.where(winner_sorted, slot_s, NT)]
        .set(1, mode="drop")
    )[:, :NT] > 0
    # per-pixel MODEL IMAGE: arena slot fused at each pixel (CAP = none);
    # winner pixels are distinct so the scatter is collision-free
    model_img = (
        jnp.full((B, HW + 1), CAP, dtype=jnp.int32)
        .at[bsrt, jnp.where(winner_sorted, pix_s, HW)]
        .set(slot_s, mode="drop")
    )[:, :HW]

    # ---- dense merge: every view row computes the value it WOULD get as
    # a winner (identical math to the row path's mrows), selected under
    # the winner mask — no winner-row or winner-frame gathers
    alpha = fa[..., 9:10]
    cc = view[..., 9:10]
    cc_new = cc + alpha
    inv = 1.0 / jnp.where(cc_new == 0, jnp.ones_like(cc_new), cc_new)
    merged10 = [
        (cc * view[..., 0:3] + alpha * fp) * inv,
        (cc * view[..., 3:6] + alpha * fn) * inv,
        (cc * view[..., 6:9] + alpha * fa[..., 6:9]) * inv,
        cc_new,
    ]
    if has_labels:
        mlab, mconf = view[..., 10:11], view[..., 11:12]
        flab = fa[..., 10:11]
        conf_new = jnp.where(mlab == flab, mconf + alpha, mconf - alpha)
        label_ch = jnp.concatenate(
            [jnp.where(conf_new >= 0, mlab, flab), jnp.abs(conf_new)], -1
        )
    else:
        label_ch = view[..., 10:12]
    merged = jnp.concatenate(merged10 + [label_ch], axis=-1)
    new_view = jnp.where(wmask[..., None], merged, view)
    data = jax.lax.dynamic_update_slice(map_state.data, new_view, (0, 0, 0))

    pix_corr = model_img < CAP
    state = MapState(data=data, num_points=map_state.num_points)

    # ---- append non-corresponded valid pixels (same as the row path) ----
    new_mask = valid_depth.reshape(B, HW) & ~pix_corr
    if has_labels:
        tail = frame_attr[..., 9:10]
    else:
        tail = jnp.zeros((B, HW, 2), dtype=frame_attr.dtype)
    frame_rows = jnp.concatenate([frame_attr, tail], -1)
    out = append_rows_to_map(state, frame_rows, new_mask)
    if not return_active:
        return out

    app_slot = (
        map_state.num_points[:, None]
        + jnp.cumsum(new_mask, axis=1, dtype=jnp.int32)
        - 1
    )
    app_valid = new_mask & (app_slot < CAP)
    mi_win = model_img  # winner-only model image (pre-append overlay)
    model_img = jnp.where(app_valid, app_slot, model_img)
    if not dense_model_rows:
        return out, (arena_slot, avalid, model_img)
    # MODEL ROWS: per-pixel odometry target rows. Winner pixels read the
    # merged view row at their model slot (ONE wide row gather from the
    # window-sized view — the row path needed a rank scatter + a gather
    # from its compact mrows buffer); appended pixels read their frame
    # row. Bitwise identical to gathering the arena at model_img.
    rows_w = jnp.take_along_axis(
        new_view, jnp.minimum(mi_win, NT - 1)[..., None], axis=1
    )
    has_win = mi_win < CAP
    mr6 = jnp.where(has_win[..., None], rows_w[..., 0:6], 0.0)
    mr6 = jnp.where(app_valid[..., None], frame_rows[..., 0:6], mr6)
    tval = (has_win | app_valid).astype(mr6.dtype)
    model_rows = jnp.concatenate([mr6, tval[..., None]], axis=-1)
    return out, (arena_slot, avalid, model_img, model_rows)


def fusion_update_compact(
    map_state: MapState,
    frame_vertex_global: jnp.ndarray,
    frame_normal_global: jnp.ndarray,
    frame_vertex_local: jnp.ndarray,
    rgb_image: jnp.ndarray,
    valid_depth: jnp.ndarray,
    pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    dist_th: float,
    dot_th: float,
    sigma: float,
    active_capacity: int,
    block_size: Optional[int] = None,
    visible_capacity: Optional[int] = None,
    return_active: bool = False,
    frame_labels: Optional[jnp.ndarray] = None,
    merge_window: Optional[int] = None,
    assoc_window: int = -1,
    dense_model_rows: bool = False,
    window_merge: str = "dense",
    need_active_set: bool = True,
) -> MapState:
    """One-pass PointFusion update with active-set compaction (fast path).

    Semantically equivalent to ``find_correspondences_dense`` +
    ``fuse_map_dense`` but engineered for TPU gather/scatter cost, which is
    dominated by the number of random-index rows touched:

      - Active map points (those projecting into the frame) are compacted
        into a fixed ``active_capacity`` buffer first, so every subsequent
        gather/segment op runs over A = O(H*W) rows instead of the full
        arena capacity — per-frame cost becomes independent of map size.
      - Frame attributes (vertex, normal, rgb, alpha) are packed into one
        (B, H*W, 10) image so the per-active-point frame lookup is a single
        10-channel row gather instead of four 1-3-channel gathers.
      - Winner merge results are scattered back to the arena in one pass.

    If more than ``active_capacity`` map points are active, the
    highest-index extras are deterministically dropped from association
    for this frame (they are simply not merged; the affected pixels may
    append a duplicate point). Size ``active_capacity`` generously
    (default 4*H*W) to make this a non-event.

    With ``return_active`` a tuple ``(arena_slots (B, A) int32, valid
    (B, A) bool, model_img (B, H*W) int32)`` is also returned — the next
    frame's odometry candidates (its prev_pose is this frame's pose),
    saving that step a full-arena compaction, plus the per-pixel MODEL
    IMAGE: the arena slot of the point fused (merged or appended) at each
    pixel, ``CAP`` where none. The model image is the association target
    for projective odometry (slam/icpslam.py, ``assoc='projective'``).

    With ``dense_model_rows`` the tuple gains a 4th element: the MODEL
    ROWS (B, H*W, 7) ``[point(3), normal(3), valid(1)]`` — the
    projective-odometry target image built densely from this frame's
    merge results (winner pixels read their merged row, appended pixels
    their frame row), bitwise-identical to gathering the arena at
    ``model_img`` but without a random gather into a large arena (see
    :func:`_resolve_model_rows`).

    With ``frame_labels`` ((B, H, W) integer semantic labels, e.g. from the
    ScanNet loader) the arena's spare channels carry a per-point label
    fused by streaming majority (Boyer-Moore): a matching observation adds
    its alpha to the label confidence, a disagreeing one subtracts it, and
    the label flips when confidence crosses zero. Net-new vs the reference
    (which never fuses semantics).

    ``assoc_window`` (<=0 off — default, exact; >0 static prefix rows)
    enables capacity-windowed association: live arena rows are a
    contiguous prefix, so association (projection + compaction — the
    CAP-proportional stages) runs on the static slice
    ``data[:, :assoc_window]``. While ``max(num_points)`` stays within
    the window this is exact (identical association, winners and
    tie-breaks; values may differ by 1-2 ulp of XLA fusion rounding
    across program shapes); rows beyond it are deterministically
    excluded from association, with the same consequence as
    ``active_capacity`` overflow (not merged; duplicate appends
    possible). Size it to the expected working set. Ignored on the
    ``block_size`` path (the visible sub-arena already bounds the
    association cost).

    ``merge_window`` (-1 auto, 0/None off, >0 explicit) selects the
    windowed winner writeback; auto enables it while the arena is at most
    12*H*W rows.

    ``window_merge`` ('dense' default | 'rows') selects the windowed
    path's merge formulation: 'dense' computes merge results densely per
    view row (:func:`_fusion_window_dense` — fastest measured), 'rows'
    keeps the row-compacted winner writeback (the pre-round-5 path, kept
    as the equivalence oracle). Bitwise-identical results.

    ``need_active_set`` (True): set False when the caller does NOT
    consume the returned ``(arena_slot, avalid)`` as odometry candidates
    (the projective-association pipeline) — the dense window path then
    compacts GATED rows instead of active rows, so the ``A`` buffer
    holds only rows that can actually win (dropping a non-gated active
    is free; dropping a gated one — which active compaction does under
    load — loses a merge). The returned pair is then the gated set.
    """
    if window_merge not in ("dense", "rows"):
        raise ValueError(
            f"window_merge must be 'dense' or 'rows', got {window_merge!r}"
        )
    B, H, W, _ = frame_vertex_global.shape
    CAP = map_state.capacity
    HW = H * W
    A = active_capacity

    from ..ops.masking import compact_masked

    # packed frame attributes (map-independent, hoisted out of the window
    # dispatch): gv(3) gn(3) rgb(3) alpha(1) [label(1)] -> one gather
    alpha_img = get_alpha(frame_vertex_local, sigma, keepdim=True)
    attrs = [frame_vertex_global, frame_normal_global, rgb_image, alpha_img]
    if frame_labels is not None:
        attrs.append(
            frame_labels.reshape(B, H, W, 1).astype(alpha_img.dtype)
        )
    frame_attr = jnp.concatenate(attrs, axis=-1).reshape(B, HW, -1)

    def _winner_slots(src_data, src_live, src_slots, compact=True):
        """Projective association + winner selection against a map view.

        ``src_data``/``src_live``: candidate rows + live mask. ``src_slots``
        maps view rows to absolute arena slots (None = the view is the
        arena prefix, so view index == arena slot). ``compact=False``
        (valid only for a prefix view no larger than the active buffer):
        the view rows ARE the active buffer — skips the compaction and
        the active-row gather entirely (the winner sort handles inactive
        rows by keying them past the last pixel, so compaction's only
        remaining job was bounding the buffer size).

        Returns (arena_slot, avalid, wslots (B, H*W) absolute winner slot
        per rank, CAP sentinel); arena_slot/avalid are (B, A) compacted,
        or (B, view rows) uncompacted. The merge itself runs afterwards;
        its cost is O(H*W), independent of view size.
        """
        h, w, active = _project_points_to_frame(
            src_data[..., 0:3], src_live, pose, intrinsics, H, W
        )
        if compact:
            idxb, avalid = compact_masked(active, A)  # (B, A) view rows

            # one packed-row gather pulls every map attribute of the
            # active set
            ma = jnp.take_along_axis(src_data, idxb[..., None], axis=1)
            mp = ma[..., 0:3]
            # recompute the projected pixel from the gathered positions
            # instead of gathering the precomputed pixel image: same math
            # on the same inputs (bitwise identical), and vectorized
            # flops on A rows are ~free while the extra random gather
            # costs ~0.8 ms/frame
            ha, wa, _ = _project_points_to_frame(
                mp, jnp.ones_like(avalid), pose, intrinsics, H, W
            )
            pixa = ha * W + wa  # (B, A)
            # arena slot of each active row (tie-break + write-back)
            if src_slots is None:
                arena_slot = idxb
            else:
                arena_slot = jnp.take_along_axis(src_slots, idxb, axis=1)
        else:
            # direct window association: the view is the candidate buffer
            assert src_slots is None
            NA = src_data.shape[1]
            ma = src_data
            mp = ma[..., 0:3]
            pixa = h * W + w  # (B, NA); h/w clamped in-frame, safe gather
            arena_slot = jnp.broadcast_to(
                jnp.arange(NA, dtype=jnp.int32)[None, :], (B, NA)
            )
            avalid = active
        mn, mcc = ma[..., 3:6], ma[..., 9:10]

        fa = jnp.take_along_axis(frame_attr, pixa[..., None], axis=1)
        fp, fn = fa[..., 0:3], fa[..., 3:6]

        gated = (
            avalid
            & are_points_close(fp, mp, dist_th)
            & are_normals_similar(fn, mn, dot_th)
        )

        # Unique winner per pixel — same lexicographic tie-break as the
        # reference's torch.unique row sort (max ccount, min ray dist, min
        # index), implemented as ONE multi-key lax.sort over the active
        # set instead of three segment scatter/gather rounds: rows sort by
        # (pixel, -ccount, raydist, slot); the first row of each pixel
        # group is the winner.
        pix_seg = jnp.where(gated, pixa, HW).astype(jnp.int32)
        cc1 = mcc[..., 0]
        ray = jnp.sum((mp - fp) ** 2, axis=-1)
        slot = arena_slot  # original arena index for deterministic tie-break

        pix_sorted, _, _, slot_sorted = jax.vmap(
            # slot is unique per row, so the 4-key tuple is unique and
            # stability is redundant — is_stable=False drops the iota
            # tie-break operand XLA otherwise adds to the sort
            lambda p, c, r, s: jax.lax.sort(
                (p, -c, r, s), num_keys=4, is_stable=False
            )
        )(pix_seg, cc1, ray, slot)
        first = jnp.concatenate(
            [
                jnp.ones((B, 1), dtype=bool),
                pix_sorted[:, 1:] != pix_sorted[:, :-1],
            ],
            axis=1,
        )
        winner_sorted = first & (pix_sorted < HW)

        # Winner write-back. The 12-channel row scatter costs ~45 ns per
        # PROCESSED source row (dropped rows cost the same), so only winner
        # rows (at most one per pixel) may reach the arena scatter. Compact
        # winners directly in SORTED space: winners are distinct pixels, so
        # rank-among-winners (a cumsum) is a collision-free scatter address
        # into an HW buffer. This costs ONE s32 scatter over A rows and
        # replaces the previous round-trip (scatter the winner mask back to
        # original row order + a second A-row sort compaction + two winner
        # gathers). The merge math then runs on HW rows instead of A.
        rank = jnp.cumsum(winner_sorted, axis=1) - 1
        dest = jnp.where(winner_sorted, rank, HW)  # non-winners -> dropped
        b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], pix_seg.shape)
        wslots = (
            jnp.full((B, HW), CAP, dtype=jnp.int32)
            .at[b_idx, dest]
            .set(slot_sorted, mode="drop")
        )  # (B, HW) ABSOLUTE arena slot per winner; CAP where no winner
        # TRIED AND REJECTED (round 4): re-sorting winner slots ascending
        # before the winner-row gather (hypothesis: sequential reads of
        # the big planar arena beat random ones). Measured NO index-order
        # effect on v5e at CAP=1.2M — 12-ch row gathers run ~30 ns/row and
        # row scatters ~128 ns/row for random AND sorted indices
        # (tools/diag_sorted_scatter.py, round-5 re-run after fixing a
        # LICM bug that understated the gather as ~9 ns/row) — so the
        # extra HW-row sort was a pure ~0.5 ms loss (68.3 vs 69.6 fps at
        # the ScanNet point).
        return arena_slot, avalid, wslots

    merge_tgt = None  # None -> merge into the full arena
    if block_size is not None:
        # spatial block gating: association over visible blocks only
        vcap = visible_capacity or max(
            8, (4 * HW + block_size - 1) // block_size
        )
        src_data, src_slots, src_live = visible_subarena(
            map_state, pose, intrinsics, H, W, block_size, vcap
        )
        arena_slot, avalid, wslots = _winner_slots(
            src_data, src_live, src_slots
        )
    else:
        # Capacity-windowed association: live rows are a contiguous
        # prefix [0, num_points), so association runs on the static slice
        # data[:, :window] — the CAP-proportional stages (projection,
        # compaction block sort) then scale with the configured
        # working-set bound, not the worst-case capacity. See
        # _resolve_assoc_window for the (deterministic-drop) overflow
        # semantics and why this is a static slice, not a lax.cond.
        win = _resolve_assoc_window(assoc_window, CAP)
        if win is None:
            arena_slot, avalid, wslots = _winner_slots(
                map_state.data, map_mask(map_state), None
            )
        else:
            live = (
                jnp.arange(win, dtype=jnp.int32)[None, :]
                < map_state.num_points[:, None]
            )
            view = map_state.data[:, :win]
            if window_merge == "dense":
                # dense-merge formulation (default): one wide frame
                # gather + sorted-space winner masks + dense merge select
                # — see _fusion_window_dense for the measured trade
                return _fusion_window_dense(
                    map_state, view, live, frame_attr, valid_depth,
                    pose, intrinsics, dist_th, dot_th, H, W, A,
                    compact=win > A, has_labels=frame_labels is not None,
                    return_active=return_active,
                    dense_model_rows=dense_model_rows,
                    need_active_set=need_active_set,
                )
            # win <= A: the window rows ARE the active buffer — no
            # compaction, no active-row gather (see _winner_slots)
            arena_slot, avalid, wslots = _winner_slots(
                view, live, None, compact=win > A
            )
            merge_tgt = view

    if merge_tgt is None:
        merge_tgt = map_state.data

    # ---- winner merge: O(H*W), into the merge target -------------------
    # The target is the assoc prefix view when active (winner slots only
    # come from the window, and writing the view back is a static-offset
    # update the compiler does in place; the writeback's layout work
    # then scales with the window, not capacity), else the full arena.
    NT = merge_tgt.shape[1]
    wvalid = wslots < CAP

    # winner attributes: ONE wide row gather. Source selection is
    # capacity-dependent:
    #   - small arenas: gather the ARENA directly (bitwise equal to
    #     reading the prefix view, but the TPU gather kernel consumes the
    #     arena's channel-major layout directly; reading the row-major
    #     VIEW made layout assignment relayout the whole arena first,
    #     304 us/frame at the bench point);
    #   - large arenas (CAP > 12*H*W, assoc window active): gather the
    #     WINDOW VIEW — every winner slot is inside the window by
    #     construction, the view is already materialized for the
    #     association-side gather, and the full-arena gather degrades
    #     once the table outgrows cache (trace: 25.8 vs 5.5 ns/row at
    #     CAP=1.2M; microbench with full random permutations: 30.3 vs
    #     13.9 ns/row at 1.2M vs 307k rows — table size, not index
    #     order, is what matters: tools/diag_sorted_scatter.py).
    # The winner's pixel is recomputed from the gathered position (same
    # math on the same inputs as the value that won the sort — bitwise
    # identical, and vectorized flops on HW rows are ~free while an
    # extra payload channel in sort + scatter is not).
    if NT != CAP and CAP > 12 * HW:
        maw = jnp.take_along_axis(
            merge_tgt, jnp.minimum(wslots, NT - 1)[..., None], axis=1
        )  # (B, HW, 12)
    else:
        maw = jnp.take_along_axis(
            map_state.data, jnp.minimum(wslots, CAP - 1)[..., None], axis=1
        )  # (B, HW, 12)
    mpw, mnw, mcow, mccw = (
        maw[..., 0:3], maw[..., 3:6], maw[..., 6:9], maw[..., 9:10]
    )
    hw_w, ww_w, _ = _project_points_to_frame(
        mpw, wvalid, pose, intrinsics, H, W
    )
    pixw = hw_w * W + ww_w  # (B, HW)
    faw = jnp.take_along_axis(
        frame_attr, jnp.where(wvalid, pixw, 0)[..., None], axis=1
    )
    fpw, fnw, fcw = faw[..., 0:3], faw[..., 3:6], faw[..., 6:9]

    # per-pixel MODEL IMAGE: arena slot of the fused point at each pixel
    # (CAP sentinel where none). One s32 scatter over HW rows; the
    # correspondence mask falls out of it for free. Winner pixels are
    # distinct by construction, so the scatter is collision-free.
    bw = jnp.broadcast_to(jnp.arange(B)[:, None], (B, HW))
    model_img = (
        jnp.full((B, HW + 1), CAP, dtype=jnp.int32)
        .at[bw, jnp.where(wvalid, pixw, HW)]
        .set(wslots, mode="drop")
    )[:, :HW]

    # confidence-weighted merge on the winner rows
    alpha = jnp.where(wvalid[..., None], faw[..., 9:10], 0.0)
    cc_new = mccw + alpha
    inv = 1.0 / jnp.where(cc_new == 0, jnp.ones_like(cc_new), cc_new)
    mrows10 = [
        (mccw * mpw + alpha * fpw) * inv,
        (mccw * mnw + alpha * fnw) * inv,
        (mccw * mcow + alpha * fcw) * inv,
        cc_new,
    ]
    if frame_labels is not None:
        # streaming-majority label update
        mlab, mconf = maw[..., 10:11], maw[..., 11:12]
        flab = faw[..., 10:11]
        conf_new = jnp.where(mlab == flab, mconf + alpha, mconf - alpha)
        label_ch = jnp.concatenate(
            [jnp.where(conf_new >= 0, mlab, flab), jnp.abs(conf_new)], -1
        )
    else:
        # no label fusion: write the spare channels back unchanged (a
        # narrower 10-ch slice scatter lowers catastrophically — 50x
        # slower, measured — so keep the full-width row scatter)
        label_ch = maw[..., 10:12]
    mrows = jnp.concatenate(mrows10 + [label_ch], axis=-1)  # (B, HW, 12)
    if NT == CAP:
        data = _winner_writeback(
            merge_tgt, wslots, wvalid, mrows, bw,
            _resolve_merge_window(merge_window, H, W, NT),
        )
    else:
        # STATIC window writeback: every valid winner slot is inside the
        # prefix view by construction, so no span check / lax.cond /
        # dynamic slicing is needed — invert the slot map with one s32
        # rank scatter over the view, gather each view row's merge row,
        # and select densely (all layout-friendly on the channel-major
        # view). Then one static-offset update writes the view back.
        rank = jnp.broadcast_to(
            jnp.arange(HW, dtype=jnp.int32)[None, :], (B, HW)
        )
        inv = (
            jnp.full((B, NT + 1), HW, jnp.int32)
            .at[bw, jnp.where(wvalid, wslots, NT)]
            .set(rank, mode="drop")
        )[:, :NT]
        rows = jnp.take_along_axis(
            mrows, jnp.minimum(inv, HW - 1)[..., None], axis=1
        )
        new_view = jnp.where((inv < HW)[..., None], rows, merge_tgt)
        data = jax.lax.dynamic_update_slice(
            map_state.data, new_view, (0, 0, 0)
        )

    pix_corr = model_img < CAP
    state = MapState(data=data, num_points=map_state.num_points)

    new_mask = valid_depth.reshape(B, HW) & ~pix_corr
    if frame_labels is not None:
        # appended points carry their frame label at confidence alpha
        tail = frame_attr[..., 9:10]
    else:
        tail = jnp.zeros((B, HW, 2), dtype=frame_attr.dtype)
    frame_rows = jnp.concatenate([frame_attr, tail], -1)
    out = append_rows_to_map(state, frame_rows, new_mask)
    if return_active:
        # appended rows land at num_points + rank (dropped past capacity);
        # add them to the model image so it covers every pixel with a
        # model point visible at this pose (dense ops, no scatter)
        app_slot = (
            map_state.num_points[:, None]
            + jnp.cumsum(new_mask, axis=1, dtype=jnp.int32)
            - 1
        )
        app_valid = new_mask & (app_slot < CAP)
        model_img = jnp.where(app_valid, app_slot, model_img)
        if not dense_model_rows:
            return out, (arena_slot, avalid, model_img)
        # MODEL ROWS: the per-pixel odometry target rows, built densely.
        # The arena row at model_img[pix] is — by construction of the
        # writeback and the append — either this frame's merge row
        # (winner pixels: mrows[rank]) or this frame's frame row
        # (appended pixels), so both can be read from the H*W-sized
        # buffers already in hand instead of gathering the (large,
        # planar, cache-hostile) arena at random indices next frame.
        # Bitwise identical to that gather.
        rank = jnp.broadcast_to(
            jnp.arange(HW, dtype=jnp.int32)[None, :], (B, HW)
        )
        rank_img = (
            jnp.full((B, HW + 1), HW, dtype=jnp.int32)
            .at[bw, jnp.where(wvalid, pixw, HW)]
            .set(rank, mode="drop")
        )[:, :HW]
        win_rows = jnp.take_along_axis(
            mrows, jnp.minimum(rank_img, HW - 1)[..., None], axis=1
        )
        has_win = rank_img < HW
        mr6 = jnp.where(has_win[..., None], win_rows[..., 0:6], 0.0)
        mr6 = jnp.where(app_valid[..., None], frame_rows[..., 0:6], mr6)
        tval = (has_win | app_valid).astype(mr6.dtype)
        model_rows = jnp.concatenate([mr6, tval[..., None]], axis=-1)
        return out, (arena_slot, avalid, model_img, model_rows)
    return out


def aggregate_map_dense(
    map_state: MapState,
    frame_vertex_global: jnp.ndarray,
    frame_normal_global: jnp.ndarray,
    frame_vertex_local: jnp.ndarray,
    rgb_image: jnp.ndarray,
    valid_depth: jnp.ndarray,
    sigma: float = 0.6,
    frame_labels: Optional[jnp.ndarray] = None,
) -> MapState:
    """Append-only map update (reference ``update_map_aggregate``,
    fusionutils.py:725-758): every valid-depth pixel is appended.
    Optional ``frame_labels`` land in the arena's semantic channels."""
    B, H, W, _ = frame_vertex_global.shape
    HW = H * W
    alpha_img = get_alpha(frame_vertex_local, sigma, keepdim=True)
    if frame_labels is None:
        return append_to_map(
            map_state,
            frame_vertex_global.reshape(B, HW, 3),
            frame_normal_global.reshape(B, HW, 3),
            rgb_image.reshape(B, HW, 3),
            alpha_img.reshape(B, HW, 1),
            valid_depth.reshape(B, HW),
        )
    alpha = alpha_img.reshape(B, HW, 1)
    rows = jnp.concatenate(
        [
            frame_vertex_global.reshape(B, HW, 3),
            frame_normal_global.reshape(B, HW, 3),
            rgb_image.reshape(B, HW, 3),
            alpha,
            frame_labels.reshape(B, HW, 1).astype(alpha.dtype),
            alpha,  # label confidence starts at alpha
        ],
        axis=-1,
    )
    return append_rows_to_map(map_state, rows, valid_depth.reshape(B, HW))


# ---------------------------------------------------------------------------
# Host-facing parity wrappers (ragged pc2im_bnhw tables, Pointclouds API)
# ---------------------------------------------------------------------------


def _pointclouds_to_mapstate(pointclouds) -> MapState:
    import jax.numpy as jnp

    feats = pointclouds.features_padded
    if feats is None:
        feats = jnp.zeros(pointclouds.points_padded.shape[:2] + (1,))
    normals = pointclouds.normals_padded
    if normals is None:
        normals = jnp.zeros_like(pointclouds.points_padded)
    colors = pointclouds.colors_padded
    if colors is None:
        colors = jnp.zeros_like(pointclouds.points_padded)
    return MapState.from_arrays(
        pointclouds.points_padded,
        normals,
        colors,
        feats,
        pointclouds.num_points_per_pointcloud,
    )


def _table_from_mask(mask, h, w):
    """(B, CAP) masks -> (num_rows, 4) [b, n, h, w] table (host boundary)."""
    import numpy as np

    mask, h, w = np.asarray(mask), np.asarray(h), np.asarray(w)
    b_idx, n_idx = np.nonzero(mask)
    return jnp.asarray(
        np.stack(
            [b_idx, n_idx, h[b_idx, n_idx], w[b_idx, n_idx]], axis=-1
        ).astype(np.int64)
    )


def find_active_map_points(pointclouds, rgbdimages):
    """Active map points lookup table (reference fusionutils.py:198-287).

    Returns:
        (num_active, 4) int table of [batch, point, h, w] rows.
    """
    import warnings

    if not pointclouds.has_points:
        return jnp.zeros((0, 4), dtype=jnp.int64)
    rgbd = rgbdimages.to_channels_last()
    B, L, H, W = rgbd.shape
    if L != 1:
        raise ValueError(f"expected sequence length 1, got {L}")
    ms = _pointclouds_to_mapstate(pointclouds)
    h, w, active = project_map_to_frame(
        ms, rgbd.poses[:, 0], rgbd.intrinsics, H, W
    )
    table = _table_from_mask(active, h, w)
    if table.shape[0] == 0:
        warnings.warn("No active map points were found")
    return table


def find_similar_map_points(pointclouds, rgbdimages, pc2im_bnhw, dist_th, dot_th):
    """Distance/normal-gated subset of the active table (reference :290-411).

    Returns:
        (pc2im_bnhw_similar, is_similar_mask).
    """
    import warnings

    if pc2im_bnhw.shape[0] == 0:
        return (
            jnp.zeros((0, 4), dtype=jnp.int64),
            jnp.zeros((0,), dtype=bool),
        )
    if not pointclouds.has_normals:
        raise ValueError("pointclouds must have normals")
    rgbd = rgbdimages.to_channels_last()
    vmaps = rgbd.global_vertex_map[:, 0]
    nmaps = rgbd.global_normal_map[:, 0]
    b, n, h, w = (pc2im_bnhw[:, i] for i in range(4))
    fp = vmaps[b, h, w]
    fn = nmaps[b, h, w]
    mp = pointclouds.points_padded[b, n]
    mn = pointclouds.normals_padded[b, n]
    keep = are_points_close(fp, mp, dist_th) & are_normals_similar(fn, mn, dot_th)
    out = pc2im_bnhw[jnp.asarray(keep)]
    if out.shape[0] == 0:
        warnings.warn(
            "No similar map points were found (despite total {0} active "
            "points across the batch)".format(pc2im_bnhw.shape[0]),
            RuntimeWarning,
        )
    return out, keep


def find_best_unique_correspondences(pointclouds, rgbdimages, pc2im_bnhw):
    """Per-pixel winner among duplicate correspondences (reference :414-546).

    Tie-breaking: highest ccount, then smallest squared ray distance, then
    smallest point index.
    """
    import numpy as np

    if pc2im_bnhw.shape[0] == 0:
        return jnp.zeros((0, 4), dtype=jnp.int64)
    if not pointclouds.has_features:
        raise ValueError("pointclouds must have features (ccounts)")
    rgbd = rgbdimages.to_channels_last()
    vmaps = np.asarray(rgbd.global_vertex_map[:, 0])
    tab = np.asarray(pc2im_bnhw)
    b, n, h, w = tab.T
    cc = np.asarray(pointclouds.features_padded)[b, n, 0]
    mp = np.asarray(pointclouds.points_padded)[b, n]
    fp = vmaps[b, h, w]
    ray = ((mp - fp) ** 2).sum(-1)
    # lexicographic: (b, h, w) group key; (-cc, ray, n) winner key
    order = np.lexsort((n, ray, -cc, w, h, b))
    tab_sorted = tab[order]
    key = tab_sorted[:, [0, 2, 3]]
    first = np.ones(len(tab_sorted), dtype=bool)
    first[1:] = (key[1:] != key[:-1]).any(-1)
    return jnp.asarray(tab_sorted[first])


def find_correspondences(pointclouds, rgbdimages, dist_th, dot_th):
    """Association pipeline (reference fusionutils.py:549-577)."""
    pc2im = find_active_map_points(pointclouds, rgbdimages)
    pc2im, _ = find_similar_map_points(
        pointclouds, rgbdimages, pc2im, dist_th, dot_th
    )
    return find_best_unique_correspondences(pointclouds, rgbdimages, pc2im)


def _rgbd_frame_arrays(rgbdimages):
    rgbd = rgbdimages.to_channels_last()
    return (
        rgbd.global_vertex_map[:, 0],
        rgbd.global_normal_map[:, 0],
        rgbd.vertex_map[:, 0],
        rgbd.rgb_image[:, 0],
        rgbd.valid_depth_mask[:, 0, ..., 0],
    )


def update_map_fusion(pointclouds, rgbdimages, dist_th, dot_th, sigma):
    """PointFusion update on the Pointclouds API (reference :761-789).

    The arena capacity grows by one frame's worth of pixels.
    """
    import numpy as np

    rgbd = rgbdimages.to_channels_last()
    B, L, H, W = rgbd.shape
    ms = _pointclouds_to_mapstate(pointclouds)
    if len(pointclouds) == 0:
        from ..structures.maparena import init_map

        ms = init_map(B, 0)
    # grow arena by one frame
    grow = H * W
    ms = MapState(
        data=jnp.pad(ms.data, ((0, 0), (0, grow), (0, 0))),
        num_points=ms.num_points,
    )
    gv, gn, lv, rgb, vd = _rgbd_frame_arrays(rgbd)
    corr = find_correspondences_dense(
        ms, gv, gn, rgbd.poses[:, 0], rgbd.intrinsics, dist_th, dot_th
    )
    ms = fuse_map_dense(ms, corr, gv, gn, lv, rgb, vd, sigma)
    from ..structures.maparena import map_to_pointclouds

    return map_to_pointclouds(ms)


def update_map_aggregate(pointclouds, rgbdimages, inplace: bool = False):
    """Append-only update on the Pointclouds API (reference :725-758)."""
    from ..structures.utils import pointclouds_from_rgbdimages

    new_pc = pointclouds_from_rgbdimages(rgbdimages, global_coordinates=True)
    return pointclouds.append_points(new_pc)


def fuse_with_map(pointclouds, rgbdimages, pc2im_bnhw, sigma, inplace=False):
    """Table-based fusion for API parity (reference :580-722).

    Applies the confidence-weighted merge at the rows of ``pc2im_bnhw``
    and appends non-corresponded valid-depth pixels.
    """
    import numpy as np

    rgbd = rgbdimages.to_channels_last()
    B, L, H, W = rgbd.shape
    gv, gn, lv, rgb, vd = _rgbd_frame_arrays(rgbd)
    alpha_img = get_alpha(lv, sigma, keepdim=True)

    pts = pointclouds.points_padded
    if pointclouds.has_points and pc2im_bnhw.shape[0] != 0:
        b, n, h, w = (np.asarray(pc2im_bnhw)[:, i] for i in range(4))
        fp, fn_, fc, fa = gv[b, h, w], gn[b, h, w], rgb[b, h, w], alpha_img[b, h, w]
        cc = pointclouds.features_padded
        cc_rows = cc[b, n]
        cc_new_rows = cc_rows + fa
        merge = lambda old_all, frame_rows: old_all.at[b, n].set(
            (cc_rows * old_all[b, n] + fa * frame_rows) / cc_new_rows
        )
        pointclouds = pointclouds.clone()
        pointclouds.points_padded = merge(pointclouds.points_padded, fp)
        pointclouds.normals_padded = merge(pointclouds.normals_padded, fn_)
        pointclouds.colors_padded = merge(pointclouds.colors_padded, fc)
        pointclouds.features_padded = pointclouds.features_padded.at[b, n].set(
            cc_new_rows
        )

    # append non-corresponded valid pixels (ragged, host boundary)
    new_mask = np.asarray(vd).astype(bool)
    if pointclouds.has_points and pc2im_bnhw.shape[0] != 0:
        corr_px = np.zeros((B, H, W), dtype=bool)
        corr_px[b, h, w] = True
        new_mask = new_mask & ~corr_px
    from ..structures import Pointclouds

    gv_n, gn_n, rgb_n, fa_n = (
        np.asarray(gv),
        np.asarray(gn),
        np.asarray(rgb),
        np.asarray(alpha_img),
    )
    new_pc = Pointclouds(
        points=[gv_n[i][new_mask[i]] for i in range(B)],
        normals=[gn_n[i][new_mask[i]] for i in range(B)],
        colors=[rgb_n[i][new_mask[i]] for i in range(B)],
        features=[fa_n[i][new_mask[i]] for i in range(B)],
    )
    return pointclouds.append_points(new_pc)
