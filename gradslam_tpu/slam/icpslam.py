"""ICP-SLAM: the end-to-end dense SLAM driver (TPU-native).

Parity surface with the reference's ICPSLAM (gradslam/slam/icpslam.py:18):
a sequential localize-then-map loop over frames. TPU-first design:

  - The frame loop is a single ``lax.scan`` with carry (map arena, pose) —
    one compiled program per sequence, reverse-mode differentiable through
    the whole SLAM run (the reference loops in Python, icpslam.py:125-137).
  - Localization (reference ``_localize``, icpslam.py:180-247) projects the
    live map into the previous frame, downsamples by pixel stride, compacts
    candidates into a fixed-size target buffer, and runs the batched
    gradICP/ICP solver (odometry/icputils.py) with the Pallas KNN.
  - Mapping (reference ``_map``) is the dense aggregate/fusion update
    (slam/fusionutils.py) over the fixed-capacity arena.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry import compose_transformations
from ..odometry.icputils import (
    point_to_plane_ICP,
    point_to_plane_ICP_projective,
    point_to_plane_gradICP,
    point_to_plane_gradICP_projective,
)
from ..ops.masking import compact_masked
from ..structures import RGBDImages, map_to_pointclouds
from ..structures.maparena import MapState, init_map
from ..structures.rgbdimages import (
    compute_global_normal_map,
    compute_global_vertex_map,
    compute_normal_map,
    compute_vertex_map,
)
from .fusionutils import (
    _project_points_to_frame,
    _resolve_model_rows,
    aggregate_map_dense,
    fusion_update_compact,
)

__all__ = [
    "ICPSLAM",
    "SLAMOptions",
    "SLAMState",
    "slam_step",
    "slam_init_state",
    "slam_step_state",
    "slam_sequence",
]


class SLAMOptions(NamedTuple):
    """Static SLAM configuration (hashable; part of the jit cache key)."""

    odom: str = "gradicp"  # 'gt' | 'icp' | 'gradicp'
    assoc: str = "knn"  # odometry association: 'knn' | 'projective'
    dsratio: int = 4
    pyramid: Optional[Tuple[int, ...]] = None  # coarse-to-fine dsratios
    numiters: int = 20
    damp: float = 1e-8
    dist_thresh: Optional[float] = None  # odometry association gate (sq dist)
    robust_delta: Optional[float] = None  # Huber threshold on ICP residuals
    fusion: bool = False  # False -> aggregate mapping (ICPSLAM)
    dist_th: float = 0.05  # fusion distance threshold
    dot_th: float = 0.93969262  # fusion normal-dot threshold (cos 20 deg)
    sigma: float = 0.6
    map_capacity: Optional[int] = None  # default: L*H*W
    tgt_capacity: Optional[int] = None  # odometry candidate buffer
    active_capacity: Optional[int] = None  # fusion active-set buffer (2*H*W)
    block_size: Optional[int] = None  # spatial block gating (None = off)
    visible_capacity: Optional[int] = None  # visible-block buffer
    lambda_max: float = 2.0
    B: float = 1.0
    B2: float = 1.0
    nu: float = 200.0
    reuse_actives: bool = True  # odometry candidates from prev fusion step
    merge_window: int = -1  # fusion writeback window (-1 auto=2*H*W, 0 off)
    assoc_window: int = 0  # assoc prefix window rows (<=0 off = exact)
    odom_targets: str = "map"  # aggregate mapping: 'map' (reference:
    # all active points) | 'recent' (prev frame's appends — bounded cost)
    model_rows: str = "auto"  # projective odometry targets: 'gather'
    # (random-index arena row gather at model_img) | 'dense' (carry the
    # per-pixel target rows, built densely at fusion time — avoids the
    # random gather into a large arena, whose cost degrades ~5x once the
    # arena outgrows cache) | 'auto' (dense iff capacity > 12*H*W, the
    # same large-map crossover as merge_window)
    window_merge: str = "dense"  # assoc_window merge formulation:
    # 'dense' (merge computed densely per view row, winner masks from
    # sorted space — round-5 fast path) | 'rows' (row-compacted winner
    # writeback — the pre-round-5 oracle). Bitwise-identical results.


def _frame_maps_local(depth, intrinsics):
    """Pose-INDEPENDENT derived maps for a (B, H, W, 1) depth frame:
    (vertex map, normal map, valid mask) — the 'ingest' stage of the
    pipeline-parallel schedule (parallel/pipeline.py): computable for
    frame t+1 while frame t is still being localized/fused."""
    depth5 = depth[:, None]
    vm5 = compute_vertex_map(depth5, intrinsics)
    valid5 = depth5 > 0
    nm5 = compute_normal_map(vm5, valid5)
    return vm5[:, 0], nm5[:, 0], valid5[:, 0, ..., 0]


def _frame_maps(rgb, depth, intrinsics, pose, local_maps=None):
    """Derived maps for a (B, H, W, ·) frame at the given (B, 4, 4) pose.

    ``local_maps``: optional precomputed ``(vm, nm, valid)`` from
    :func:`_frame_maps_local` (pipeline ingest handoff) — pose
    application is the only work left."""
    if local_maps is None:
        local_maps = _frame_maps_local(depth, intrinsics)
    vm, nm, valid = local_maps
    valid5 = valid[:, None, ..., None]
    gv = compute_global_vertex_map(vm[:, None], pose[:, None], valid5)[:, 0]
    gn = compute_global_normal_map(nm[:, None], pose[:, None])[:, 0]
    return vm, nm, gv, gn, valid


def _odometry_candidates(map_state, cand_slots, cand_valid, app_start, win):
    """Materializes odometry candidate rows from the previous fusion step.

    The candidate set for localization at pose t-1 is exactly the set the
    previous frame's fusion step already compacted (its active set at pose
    t-1) plus the rows it appended — which land CONTIGUOUSLY at
    ``[app_start, num_points)`` and all project into frame t-1 by
    construction. Gathering those (A + H*W rows) replaces a full-arena
    compaction (the candidates are re-projected downstream with their
    CURRENT values, so merged-point movement is accounted for exactly; the
    only divergence from a fresh full-arena pass is points whose
    frustum-boundary status flipped due to that movement).

    Returns:
        (rows (B, A+win, 12), valid (B, A+win) bool).
    """
    CAP = map_state.capacity
    win = min(win, CAP)  # appended rows beyond capacity were dropped anyway
    rows_a = jnp.take_along_axis(
        map_state.data, cand_slots[..., None], axis=1
    )  # (B, A, 12) — current (post-merge) values
    start = jnp.clip(app_start, 0, CAP - win)

    # per-batch dynamic slices, unrolled over the static batch dim (vmap'd
    # dynamic_slice with per-batch starts lowers to a full-arena while
    # loop with relayout copies — see maparena.append_rows_to_map)
    B, _, C = map_state.data.shape
    rows_n = jnp.concatenate(
        [
            jax.lax.dynamic_slice(
                map_state.data, (b, start[b], 0), (1, win, C)
            )
            for b in range(B)
        ],
        axis=0,
    )  # (B, win, 12)
    slot_n = start[:, None] + jnp.arange(win, dtype=jnp.int32)[None, :]
    valid_n = (slot_n >= app_start[:, None]) & (
        slot_n < map_state.num_points[:, None]
    )
    rows = jnp.concatenate([rows_a, rows_n], axis=1)
    valid = jnp.concatenate([cand_valid, valid_n], axis=1)
    return rows, valid


def _localize(
    map_state, prev_pose, rgb, depth, intrinsics, opts: SLAMOptions, cand=None,
    local_maps=None,
):
    """Odometry: new pose for the live frame (reference icpslam.py:238-247).

    The live frame is seeded with the previous pose; the frame cloud is the
    strided-downsampled global vertex/normal map; the target cloud is the
    downsample-gated set of map points active in the previous frame.

    With ``opts.pyramid`` (e.g. ``(8, 4)``) the solve runs coarse-to-fine:
    each level chains its transform into the next level's initialization —
    robustness to larger inter-frame motion beyond the reference's
    single-level scheme.

    ``cand`` (optional): ``(slots, valid, app_start)`` candidate state from
    the previous fusion step (see :func:`_odometry_candidates`) — restricts
    projection + compaction to A + H*W rows instead of the full arena.
    """
    B, H, W, _ = rgb.shape
    vm, nm, gv, gn, valid = _frame_maps(
        rgb, depth, intrinsics, prev_pose, local_maps
    )
    levels = tuple(opts.pyramid or (opts.dsratio,))
    tgt_caps = tuple(
        opts.tgt_capacity or _default_tgt_capacity(H, W, ds) for ds in levels
    )

    def _level_targets(src_rows, src_live):
        """Per-pyramid-level compacted target indices (small outputs only,
        so the capacity-window dispatch can wrap this in lax.cond without
        threading the arena through the cond — see
        fusionutils.fusion_update_compact)."""
        h, w, active = _project_points_to_frame(
            src_rows[..., 0:3], src_live, prev_pose, intrinsics, H, W
        )
        out = []
        for ds, tc in zip(levels, tgt_caps):
            # active map points whose projected pixel is on the ds grid
            cand_mask = active & (h % ds == 0) & (w % ds == 0)
            out.append(compact_masked(cand_mask, tc))
        return tuple(out)

    if cand is None:
        from ..structures.maparena import map_mask
        from .fusionutils import _resolve_assoc_window

        # capacity-windowed candidate compaction: same static prefix
        # window as the fusion association (live rows are a prefix); the
        # target row gather stays on the full arena (indices absolute).
        # FUSION mapping only — in aggregate (append-only) mapping the
        # prefix is append history, so windowing would silently pin the
        # odometry targets to the first frames; use
        # opts.odom_targets='recent' there instead (slam_step_state)
        win = (
            _resolve_assoc_window(opts.assoc_window, map_state.capacity)
            if opts.fusion
            else None
        )
        if win is None:
            per_level = _level_targets(map_state.data, map_mask(map_state))
        else:
            live = (
                jnp.arange(win, dtype=jnp.int32)[None, :]
                < map_state.num_points[:, None]
            )
            per_level = _level_targets(map_state.data[:, :win], live)
        gather_src = map_state.data
    else:
        src_rows, src_valid = _odometry_candidates(
            map_state, *cand, win=H * W
        )
        per_level = _level_targets(src_rows, src_valid)
        gather_src = src_rows

    transform = None
    for lvl, ds in enumerate(levels):
        # source: strided frame points (static size per level)
        sl = (slice(None), slice(None, None, ds), slice(None, None, ds))
        src = gv[sl].reshape(B, -1, 3)
        src_valid_px = valid[sl].reshape(B, -1)

        idx, tgt_valid = per_level[lvl]
        rows = jnp.take_along_axis(gather_src, idx[..., None], axis=1)
        tgt = rows[..., 0:3]
        tgt_n = rows[..., 3:6]

        common = dict(
            numiters=opts.numiters,
            damp=opts.damp,
            dist_thresh=opts.dist_thresh,
            robust_delta=opts.robust_delta,
            src_valid=src_valid_px.astype(src.dtype),
            tgt_valid=tgt_valid,
        )
        if opts.odom == "gradicp":
            transform = point_to_plane_gradICP(
                src,
                tgt,
                tgt_n,
                transform,
                lambda_max=opts.lambda_max,
                B=opts.B,
                B2=opts.B2,
                nu=opts.nu,
                **common,
            )
        else:
            transform = point_to_plane_ICP(src, tgt, tgt_n, transform, **common)
    return compose_transformations(transform, prev_pose)


def _localize_projective(
    map_state, prev_pose, model_img, rgb, depth, intrinsics, opts: SLAMOptions,
    local_maps=None, model_rows=None,
):
    """Odometry via PROJECTIVE association against the carried model image.

    TPU-first fast path (net-new vs the reference): instead of compacting
    a candidate point set and running KNN association (O(S*T) per solver
    iteration), gather the per-pixel model rows ONCE (the model image the
    previous fusion step produced at prev_pose) and associate each source
    point by projecting it into the previous camera — O(S) per iteration.
    See odometry/icputils.gauss_newton_solve_projective.
    """
    B, H, W, _ = rgb.shape
    CAP = map_state.capacity
    _, _, gv, _, valid = _frame_maps(
        rgb, depth, intrinsics, prev_pose, local_maps
    )

    if model_rows is not None:
        # dense-carried target rows (opts.model_rows: bitwise equal to
        # the gather below, no random access into a large arena)
        tgt_img = model_rows
    else:
        # model image rows: ONE wide gather; validity packed as channel 7
        rows = jnp.take_along_axis(
            map_state.data,
            jnp.minimum(model_img, CAP - 1)[..., None],
            axis=1,
        )  # (B, HW, 12)
        tvalid = (model_img < CAP).astype(rows.dtype)
        tgt_img = jnp.concatenate(
            [rows[..., 0:6], tvalid[..., None]], axis=-1
        )

    # Projective association NEEDS a distance gate: a projection landing
    # on an unrelated surface otherwise yields a confidently wrong
    # correspondence (KNN association degrades gracefully; projective
    # does not). Default to the fusion distance threshold, squared
    # (dist_thresh gates on squared distances).
    dist_thresh = (
        opts.dist_thresh
        if opts.dist_thresh is not None
        else opts.dist_th**2
    )

    transform = None
    for ds in opts.pyramid or (opts.dsratio,):
        sl = (slice(None), slice(None, None, ds), slice(None, None, ds))
        src = gv[sl].reshape(B, -1, 3)
        src_valid_px = valid[sl].reshape(B, -1).astype(src.dtype)
        common = dict(
            numiters=opts.numiters,
            damp=opts.damp,
            dist_thresh=dist_thresh,
            robust_delta=opts.robust_delta,
            src_valid=src_valid_px,
        )
        if opts.odom == "gradicp":
            transform = point_to_plane_gradICP_projective(
                src, tgt_img, prev_pose, intrinsics, H, W, transform,
                lambda_max=opts.lambda_max, B=opts.B, B2=opts.B2, nu=opts.nu,
                **common,
            )
        else:
            transform = point_to_plane_ICP_projective(
                src, tgt_img, prev_pose, intrinsics, H, W, transform,
                **common,
            )
    return compose_transformations(transform, prev_pose)


def _default_tgt_capacity(H, W, ds):
    cap = 4 * ((H + ds - 1) // ds) * ((W + ds - 1) // ds)
    return max(1024, ((cap + 1023) // 1024) * 1024)


def _map_update(
    map_state, pose, rgb, depth, intrinsics, opts: SLAMOptions,
    return_active: bool = False, labels=None, local_maps=None,
):
    """Mapping: fuse or aggregate the live frame into the arena.

    With ``return_active`` the fusion path returns
    ``(map, (slots, valid, model_img, model_rows_or_None))`` — the
    4-tuple is normalized so callers need not care whether the dense
    model-rows carry is enabled.
    """
    vm, nm, gv, gn, valid = _frame_maps(
        rgb, depth, intrinsics, pose, local_maps
    )
    if opts.fusion:
        H, W = rgb.shape[1:3]
        dense = return_active and _resolve_model_rows(
            opts.model_rows, H, W, map_state.capacity
        )
        # projective odometry never consumes the compacted active-set
        # carry, which lets the dense window path compact GATED rows
        # (only rows that can win candidacy) instead of active rows —
        # see fusion_update_compact(need_active_set=...)
        need_active = opts.assoc != "projective"
        ret = fusion_update_compact(
            map_state,
            gv,
            gn,
            vm,
            rgb,
            valid,
            pose,
            intrinsics,
            opts.dist_th,
            opts.dot_th,
            opts.sigma,
            opts.active_capacity or 2 * H * W,
            opts.block_size,
            opts.visible_capacity,
            return_active=return_active,
            frame_labels=labels,
            merge_window=opts.merge_window,
            assoc_window=opts.assoc_window,
            dense_model_rows=dense,
            window_merge=opts.window_merge,
            need_active_set=need_active,
        )
        if not return_active:
            return ret
        out, active = ret
        if len(active) == 3:
            active = (*active, None)
        return out, active
    out = aggregate_map_dense(
        map_state, gv, gn, vm, rgb, valid, opts.sigma, frame_labels=labels
    )
    return (out, None) if return_active else out


def slam_step(
    map_state: MapState,
    prev_pose: jnp.ndarray,
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    opts: SLAMOptions,
    gt_pose: Optional[jnp.ndarray] = None,
) -> Tuple[MapState, jnp.ndarray]:
    """One SLAM step: localize then map (reference ``ICPSLAM.step``,
    icpslam.py:140-178).

    Args:
        map_state: current arena; prev_pose: (B, 4, 4).
        rgb/depth: (B, H, W, 3/1); intrinsics: (B, 1, 4, 4).
        gt_pose: (B, 4, 4), required when opts.odom == 'gt'.

    Returns:
        (new_map_state, pose).
    """
    if opts.odom == "gt":
        if gt_pose is None:
            raise ValueError("gt odometry requires gt_pose")
        pose = gt_pose
    else:
        if opts.assoc == "projective":
            raise ValueError(
                "assoc='projective' needs the carried model image — use "
                "the stateful API (slam_init_state/slam_step_state or "
                "slam_sequence) instead of slam_step"
            )
        if not opts.fusion and opts.odom_targets == "recent":
            raise ValueError(
                "odom_targets='recent' needs the carried append window "
                "(app_start) — use the stateful API (slam_init_state/"
                "slam_step_state or slam_sequence) instead of slam_step"
            )
        pose = _localize(map_state, prev_pose, rgb, depth, intrinsics, opts)
    new_map = _map_update(map_state, pose, rgb, depth, intrinsics, opts)
    return new_map, pose


class SLAMState(NamedTuple):
    """Incremental SLAM state: everything the next frame needs.

    The scan carry of :func:`slam_sequence`, exposed for online /
    streaming use: the arena, the last pose, and the odometry-candidate
    set carried from the previous fusion step (so the incremental step
    pays the same per-frame cost as the fused scan, without a full-arena
    compaction per call).

    Attributes:
        map_state: the arena.
        pose: (B, 4, 4) last frame's pose.
        cand_slots / cand_valid: (B, A) compacted fusion active set
            (with ``assoc='projective'`` the fusion step compacts GATED
            rows instead — the carry is not consumed on that path; see
            fusionutils.fusion_update_compact ``need_active_set``).
        app_start: (B,) first arena slot appended by the last frame.
        model_img: (B, H*W) int32 per-pixel model image from the last
            fusion step (arena slot fused at each pixel, CAP = none) —
            the association target for ``opts.assoc == 'projective'``.
        model_rows: None, or (B, H*W, 7) per-pixel target rows
            ``[point, normal, valid]`` carried when
            ``opts.model_rows`` resolves to dense (large arenas) —
            equals the arena rows at ``model_img`` without the random
            gather.
    """

    map_state: MapState
    pose: jnp.ndarray
    cand_slots: jnp.ndarray
    cand_valid: jnp.ndarray
    app_start: jnp.ndarray
    model_img: jnp.ndarray
    model_rows: Optional[jnp.ndarray] = None


def slam_init_state(
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    opts: SLAMOptions,
    capacity: int,
    pose0: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
) -> SLAMState:
    """Maps the first frame into a fresh arena (reference icpslam.py:127-132).

    Args:
        rgb / depth: (B, H, W, 3/1) the first frame.
        pose0: (B, 4, 4) first-frame pose (identity when None).
        labels: optional (B, H, W) semantic labels (fused into the arena's
            semantic channels).
    """
    B, H, W, _ = rgb.shape
    dtype = rgb.dtype
    map_state = init_map(B, capacity, dtype)
    if pose0 is None:
        pose0 = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (B, 4, 4))
    A = opts.active_capacity or 2 * H * W
    app_start = map_state.num_points
    if opts.fusion:
        map_state, (slots, valid, model_img, model_rows) = _map_update(
            map_state, pose0, rgb, depth, intrinsics, opts,
            return_active=True, labels=labels,
        )
    else:
        map_state = _map_update(
            map_state, pose0, rgb, depth, intrinsics, opts, labels=labels
        )
        slots = jnp.zeros((B, A), jnp.int32)
        valid = jnp.zeros((B, A), bool)
        model_img = jnp.full((B, H * W), capacity, jnp.int32)
        model_rows = None
    return SLAMState(
        map_state, pose0, slots, valid, app_start, model_img, model_rows
    )


def slam_step_state(
    state: SLAMState,
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    opts: SLAMOptions,
    gt_pose: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    local_maps=None,
) -> SLAMState:
    """One SLAM step on a :class:`SLAMState` (the scan body).

    With fusion + ICP odometry this is the fast path: odometry candidates
    come from the carried fusion active set instead of a full-arena
    compaction. Works for every ``opts`` combination (gt odometry and
    aggregate mapping fall back to the exact full paths).
    """
    if opts.odom == "gt":
        if gt_pose is None:
            raise ValueError("gt odometry requires gt_pose")
        pose = gt_pose
    elif opts.assoc == "projective":
        if not opts.fusion:
            raise ValueError(
                "assoc='projective' requires fusion mapping (the model "
                "image comes from the fusion step)"
            )
        pose = _localize_projective(
            state.map_state, state.pose, state.model_img,
            rgb, depth, intrinsics, opts, local_maps=local_maps,
            model_rows=state.model_rows,
        )
    elif opts.fusion and opts.reuse_actives:
        pose = _localize(
            state.map_state, state.pose, rgb, depth, intrinsics, opts,
            cand=(state.cand_slots, state.cand_valid, state.app_start),
            local_maps=local_maps,
        )
    elif not opts.fusion and opts.odom_targets == "recent":
        # Append-only mapping: the rows appended by the previous step ARE
        # the previous frame's cloud, stored contiguously at
        # [app_start, num_points) — classic frame-to-frame odometry with
        # bounded cost (the prefix-window trick does not apply here: the
        # arena prefix is append history, not a working set). The
        # reference associates against ALL active map points
        # ('map' mode) — in aggregate mapping those are duplicates of
        # recent appends for any surface still in view.
        B_ = rgb.shape[0]
        empty = jnp.zeros((B_, 0), jnp.int32)
        pose = _localize(
            state.map_state, state.pose, rgb, depth, intrinsics, opts,
            cand=(empty, empty.astype(bool), state.app_start),
            local_maps=local_maps,
        )
    else:
        pose = _localize(
            state.map_state, state.pose, rgb, depth, intrinsics, opts,
            local_maps=local_maps,
        )
    app_start = state.map_state.num_points
    if opts.fusion:
        m, (slots, valid, model_img, model_rows) = _map_update(
            state.map_state, pose, rgb, depth, intrinsics, opts,
            return_active=True, labels=labels, local_maps=local_maps,
        )
    else:
        m = _map_update(
            state.map_state, pose, rgb, depth, intrinsics, opts,
            labels=labels, local_maps=local_maps,
        )
        slots, valid = state.cand_slots, state.cand_valid
        model_img = state.model_img
        model_rows = state.model_rows
    return SLAMState(
        m, pose, slots, valid, app_start, model_img, model_rows
    )


_slam_init_state_jit = jax.jit(
    slam_init_state, static_argnames=("opts", "capacity")
)


@functools.partial(
    jax.jit, static_argnames=("opts", "capacity", "arena_sharding")
)
def slam_sequence(
    rgb_seq: jnp.ndarray,
    depth_seq: jnp.ndarray,
    intrinsics: jnp.ndarray,
    poses_seq: Optional[jnp.ndarray],
    opts: SLAMOptions,
    capacity: int,
    labels_seq: Optional[jnp.ndarray] = None,
    arena_sharding=None,
) -> Tuple[MapState, jnp.ndarray]:
    """Runs SLAM over a full sequence with a single ``lax.scan``.

    Args:
        rgb_seq: (B, L, H, W, 3); depth_seq: (B, L, H, W, 1).
        intrinsics: (B, 1, 4, 4).
        poses_seq: (B, L, 4, 4) ground-truth/seed poses or None.
        capacity: map arena capacity.
        labels_seq: optional (B, L, H, W) semantic labels — fused into the
            arena's semantic channels (``MapState.labels``).
        arena_sharding: optional ``NamedSharding`` (static) pinning the
            (B, CAP, 12) arena layout — e.g. ``P('data', 'map')`` to
            partition the map over the mesh's model axis. Applied to the
            scan carry every step so GSPMD keeps the arena partitioned
            through fusion/association instead of replicating it
            (parallel/sharded.py::sharded_slam sets this).

    Returns:
        (map_state, recovered_poses (B, L, 4, 4)).
    """
    B, L, H, W, _ = rgb_seq.shape
    dtype = rgb_seq.dtype
    if opts.odom == "gt" and poses_seq is None:
        raise ValueError("gt odometry requires poses")

    # frame 0: identity pose unless poses are provided (icpslam.py:127-132)
    pose0 = None if poses_seq is None else poses_seq[:, 0]
    state = slam_init_state(
        rgb_seq[:, 0], depth_seq[:, 0], intrinsics, opts, capacity, pose0,
        labels=None if labels_seq is None else labels_seq[:, 0],
    )

    def _pin_arena(st):
        if arena_sharding is None:
            return st
        return st._replace(
            map_state=st.map_state._replace(
                data=jax.lax.with_sharding_constraint(
                    st.map_state.data, arena_sharding
                )
            )
        )

    state = _pin_arena(state)

    if L == 1:
        return state.map_state, state.pose[:, None]

    xs = (
        jnp.swapaxes(rgb_seq[:, 1:], 0, 1),  # (L-1, B, H, W, 3)
        jnp.swapaxes(depth_seq[:, 1:], 0, 1),
        (
            jnp.swapaxes(poses_seq[:, 1:], 0, 1)
            if poses_seq is not None
            else jnp.zeros((L - 1, B, 4, 4), dtype)
        ),
        (
            None
            if labels_seq is None
            else jnp.swapaxes(labels_seq[:, 1:], 0, 1)
        ),
    )

    first_pose = state.pose[:, None]  # (B, 1, 4, 4)

    def scan_body(carry, x):
        rgb, depth, gt_pose, labels = x
        new = slam_step_state(
            carry, rgb, depth, intrinsics, opts,
            gt_pose if opts.odom == "gt" else None,
            labels=labels,
        )
        return _pin_arena(new), new.pose

    state, poses_rest = jax.lax.scan(scan_body, state, xs)
    poses = jnp.concatenate(
        [first_pose, jnp.swapaxes(poses_rest, 0, 1)], axis=1
    )
    return state.map_state, poses


class ICPSLAM:
    """ICP-SLAM pipeline (reference gradslam/slam/icpslam.py:18).

    Example:
        >>> slam = ICPSLAM(odom='gradicp')
        >>> pointclouds, poses = slam(rgbdimages)

    Args:
        odom: odometry method, one of 'gt', 'icp', 'gradicp'.
        dsratio: downsampling ratio for ICP (default 4).
        pyramid: optional coarse-to-fine dsratio levels, e.g. (8, 4).
        numiters: ICP iterations per level (default 20).
        damp / dist_thresh: solver damping and association gate.
        robust_delta: optional Huber threshold on ICP residuals.
        map_capacity: override the arena capacity (default L*H*W).
        block_size / visible_capacity: spatial block gating for large maps.
        loop_closure: None (off) or 'pose'/'appearance'/'both' — after the
            sequence, detect + ICP-verify + pose-graph-correct loop
            closures on the recovered trajectory
            (:func:`~gradslam_tpu.slam.loopclosure.close_loops_rgbd`;
            appearance uses the viewpoint-robust invariant descriptor).
        loop_closure_kwargs: threshold overrides forwarded to it.
    """

    _fusion = False

    def __init__(
        self,
        *,
        odom: str = "gradicp",
        dsratio: int = 4,
        numiters: int = 20,
        damp: float = 1e-8,
        dist_thresh: Optional[float] = None,
        map_capacity: Optional[int] = None,
        tgt_capacity: Optional[int] = None,
        loop_closure: Optional[str] = None,
        loop_closure_kwargs: Optional[dict] = None,
        **kwargs,
    ):
        if odom not in ("gt", "icp", "gradicp"):
            raise ValueError(
                f"odometry method {odom!r} not in ('gt', 'icp', 'gradicp')"
            )
        if loop_closure is not None and loop_closure not in (
            "pose", "appearance", "both"
        ):
            raise ValueError(
                "loop_closure must be None, 'pose', 'appearance' or "
                f"'both', got {loop_closure!r}"
            )
        assoc = kwargs.get("assoc", "knn")
        if assoc not in ("knn", "projective"):
            raise ValueError(
                f"association {assoc!r} not in ('knn', 'projective')"
            )
        model_rows = kwargs.get("model_rows", "auto")
        if model_rows not in ("auto", "dense", "gather"):
            raise ValueError(
                f"model_rows {model_rows!r} not in ('auto', 'dense', "
                "'gather')"
            )
        window_merge = kwargs.get("window_merge", "dense")
        if window_merge not in ("dense", "rows"):
            raise ValueError(
                f"window_merge {window_merge!r} not in ('dense', 'rows')"
            )
        odom_targets = kwargs.get("odom_targets", "map")
        if odom_targets not in ("map", "recent"):
            raise ValueError(
                f"odom_targets {odom_targets!r} not in ('map', 'recent')"
            )
        if odom_targets == "recent" and self._fusion:
            raise ValueError(
                "odom_targets='recent' applies to aggregate mapping "
                "(ICPSLAM) only; fusion odometry already reuses the "
                "previous fusion step's active set"
            )
        if assoc == "projective" and not self._fusion:
            raise ValueError(
                "assoc='projective' requires fusion mapping (PointFusion)"
            )
        if kwargs.get("assoc_window", 0) > 0 and not self._fusion:
            raise ValueError(
                "assoc_window requires fusion mapping (PointFusion): in "
                "aggregate mapping the arena prefix is append history, "
                "not a working set — use odom_targets='recent' to bound "
                "odometry cost instead"
            )
        if (
            kwargs.get("assoc_window", 0) > 0
            and kwargs.get("block_size") is not None
        ):
            raise ValueError(
                "assoc_window and block_size are mutually exclusive "
                "working-set bounds: block gating replaces the prefix "
                "window in fusion (the window would silently not apply "
                "there) — pick one"
            )
        if (
            kwargs.get("assoc_window", 0) > 0
            and kwargs.get("merge_window", -1) > 0
        ):
            raise ValueError(
                "an explicit merge_window has no effect with assoc_window "
                "active: the prefix-window writeback replaces the "
                "windowed winner scatter entirely — drop merge_window "
                "(or set it to -1/0)"
            )
        self.odom = odom
        self.loop_closure = loop_closure
        self.loop_closure_kwargs = dict(loop_closure_kwargs or {})
        self._jit_step = None
        self._jit_state_step = None
        self.opts = SLAMOptions(
            odom=odom,
            dsratio=dsratio,
            numiters=numiters,
            damp=damp,
            dist_thresh=dist_thresh,
            fusion=self._fusion,
            map_capacity=map_capacity,
            tgt_capacity=tgt_capacity,
            **kwargs,
        )

    def __call__(self, frames: RGBDImages):
        return self.forward(frames)

    def forward(self, frames: RGBDImages):
        """Runs SLAM over a full frame sequence.

        Returns:
            (pointclouds, poses): the recovered global map as
            :class:`Pointclouds` and (B, L, 4, 4) poses.
        """
        if not isinstance(frames, RGBDImages):
            raise TypeError(
                f"expected RGBDImages, got {type(frames).__name__}"
            )
        rgbd = frames.to_channels_last()
        B, L, H, W = rgbd.shape
        capacity = self.opts.map_capacity or L * H * W
        map_state, poses = slam_sequence(
            rgbd.rgb_image,
            rgbd.depth_image,
            rgbd.intrinsics,
            rgbd.poses,
            self.opts,
            capacity,
        )
        if self.loop_closure is not None:
            from .loopclosure import close_loops_rgbd

            poses = close_loops_rgbd(
                rgbd.rgb_image,
                rgbd.depth_image,
                rgbd.intrinsics,
                poses,
                detection=self.loop_closure,
                **self.loop_closure_kwargs,
            )
        return map_to_pointclouds(map_state), poses

    def step(
        self,
        map_state: MapState,
        live_frame: RGBDImages,
        prev_pose: Optional[jnp.ndarray] = None,
    ):
        """Incremental API: localize + map one frame (icpslam.py:140-178).

        Args:
            map_state: current arena (use ``init_map`` to create).
            live_frame: (B, 1) RGBDImages; must have poses for gt odometry.
            prev_pose: (B, 4, 4) previous pose; None for the first frame.

        Returns:
            (map_state, pose (B, 4, 4)).
        """
        rgbd = live_frame.to_channels_last()
        rgb = rgbd.rgb_image[:, 0]
        depth = rgbd.depth_image[:, 0]
        if self._jit_step is None:
            opts = self.opts
            self._jit_step = {
                "map": jax.jit(
                    lambda m, p, r, d, k: _map_update(m, p, r, d, k, opts)
                ),
                "slam": jax.jit(
                    lambda m, p, r, d, k: slam_step(m, p, r, d, k, opts)
                ),
            }
        if prev_pose is None or self.odom == "gt":
            if not rgbd.has_poses:
                raise ValueError(
                    "live_frame must have poses for the first frame or gt "
                    "odometry"
                )
            pose = rgbd.poses[:, 0]
            new_map = self._jit_step["map"](
                map_state, pose, rgb, depth, rgbd.intrinsics
            )
            return new_map, pose
        return self._jit_step["slam"](
            map_state, prev_pose, rgb, depth, rgbd.intrinsics
        )

    def init_state(
        self, live_frame: RGBDImages, capacity: Optional[int] = None
    ) -> SLAMState:
        """Starts an incremental run: maps the first frame into a fresh
        arena and returns the carried :class:`SLAMState`.

        ``capacity`` defaults to ``map_capacity`` or 100 frames' pixels.
        """
        rgbd = live_frame.to_channels_last()
        B, L, H, W = rgbd.shape
        cap = capacity or self.opts.map_capacity or 100 * H * W
        pose0 = rgbd.poses[:, 0] if rgbd.has_poses else None
        return _slam_init_state_jit(
            rgbd.rgb_image[:, 0],
            rgbd.depth_image[:, 0],
            rgbd.intrinsics,
            self.opts,
            cap,
            pose0,
        )

    def step_state(
        self, state: SLAMState, live_frame: RGBDImages
    ) -> SLAMState:
        """Fast incremental step on a :class:`SLAMState`.

        Same per-frame cost as the fused scan (odometry candidates are
        carried from the previous fusion step instead of re-compacting the
        whole arena). For gt odometry the live frame must carry poses.
        """
        rgbd = live_frame.to_channels_last()
        if self._jit_state_step is None:
            opts = self.opts
            # donate the incoming state: the arena updates in place instead
            # of allocating/copying a new one per step
            self._jit_state_step = jax.jit(
                lambda s, r, d, k, gt: slam_step_state(s, r, d, k, opts, gt),
                donate_argnums=0,
            )
        gt = rgbd.poses[:, 0] if self.opts.odom == "gt" else None
        if self.opts.odom == "gt" and gt is None:
            raise ValueError("gt odometry requires live_frame poses")
        return self._jit_state_step(
            state,
            rgbd.rgb_image[:, 0],
            rgbd.depth_image[:, 0],
            rgbd.intrinsics,
            gt,
        )

    def __repr__(self):
        return f"{type(self).__name__}(odom={self.odom!r}, opts={self.opts})"
