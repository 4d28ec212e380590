"""In-loop arena lifecycle: watermark-triggered compaction for sequences
that outgrow the fixed-capacity map arena.

The reference's map grows without bound (ragged appends,
gradslam/slam/fusionutils.py:702-721); this repo's static-shape arena
(structures/maparena.py) instead DROPS appends past capacity — silently,
if nothing manages the arena. This module closes that gap: a host-level
segmented driver runs the usual fused ``lax.scan`` in chunks and, between
chunks, reclaims arena slots when a capacity watermark is crossed
(voxel-merging near-duplicates or evicting low-confidence points — the
fixed-capacity analogue of PointFusion's unstable-point removal, Keller
et al. 2013 §4.3).

Why host-level segmenting instead of a ``lax.cond`` inside the scan: cond
branches that return the arena copy it at every cond boundary (~0.8 ms
each at ScanNet scale) and force whole-arena relayouts — measured, see
docs/PERFORMANCE.md. A host sync of one scalar per segment is orders of
magnitude cheaper.

Compaction PERMUTES arena slots, so the SLAM state's cached slot
references (odometry candidate set, projective model image) are rebuilt
afterwards by re-projecting the compacted arena at the current pose
(:func:`refresh_slam_state`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry import inverse_transformation, transform_pointcloud
from ..ops.masking import compact_masked
from ..structures.maparena import MapState, compact_map, voxel_compact_map
from .fusionutils import project_map_to_frame
from .icpslam import SLAMOptions, SLAMState, slam_init_state, slam_step_state

__all__ = [
    "refresh_slam_state",
    "compact_slam_state",
    "slam_sequence_managed",
    "slam_sequence_compacted",
]


@functools.partial(jax.jit, static_argnames=("opts", "H", "W"))
def refresh_slam_state(
    state: SLAMState, intrinsics: jnp.ndarray, opts: SLAMOptions, H: int, W: int
) -> SLAMState:
    """Rebuilds the slot-referencing caches of a :class:`SLAMState` after
    the arena was permuted (compaction/eviction).

    - ``cand_slots`` / ``cand_valid``: all arena points visible at the
      current pose (fresh full-arena projection + compaction).
    - ``model_img``: per-pixel nearest (min camera-z) visible point — the
      occlusion-correct association target for ``assoc='projective'``.
    - ``app_start``: set to ``num_points`` (no fresh appends yet).
    """
    m = state.map_state
    B = m.data.shape[0]
    CAP = m.capacity
    HW = H * W

    h, w, active = project_map_to_frame(m, state.pose, intrinsics, H, W)
    A = opts.active_capacity or 2 * H * W
    slots, valid = compact_masked(active, A)

    tinv = inverse_transformation(state.pose)
    z = transform_pointcloud(m.points, tinv)[..., 2]  # (B, CAP)
    pix = jnp.where(active, h * W + w, HW)
    idx = jnp.broadcast_to(jnp.arange(CAP, dtype=jnp.int32)[None], (B, CAP))

    def per_batch(pix_b, z_b, act_b, idx_b):
        segz = jax.ops.segment_min(
            jnp.where(act_b, z_b, jnp.inf), pix_b, num_segments=HW + 1
        )
        cand = act_b & (z_b == segz[pix_b])
        segi = jax.ops.segment_min(
            jnp.where(cand, idx_b, CAP), pix_b, num_segments=HW + 1
        )
        return segi[:HW]

    model_img = jax.vmap(per_batch)(pix, z, active, idx).astype(jnp.int32)
    model_rows = state.model_rows
    if model_rows is not None:
        # dense-carried odometry target rows (opts.model_rows): rebuild
        # from the compacted arena with one gather (refresh runs once per
        # segment, not per frame — the random gather is affordable here)
        rows = jnp.take_along_axis(
            m.data, jnp.minimum(model_img, CAP - 1)[..., None], axis=1
        )
        tval = (model_img < CAP).astype(rows.dtype)
        model_rows = jnp.concatenate(
            [rows[..., 0:6], tval[..., None]], axis=-1
        )
    return state._replace(
        cand_slots=slots,
        cand_valid=valid,
        app_start=m.num_points,
        model_img=model_img,
        model_rows=model_rows,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "opts", "H", "W", "policy", "voxel_size", "min_ccount", "keep_recent",
    ),
)
def compact_slam_state(
    state: SLAMState,
    intrinsics: jnp.ndarray,
    opts: SLAMOptions,
    H: int,
    W: int,
    policy: str = "voxel",
    voxel_size: float = 0.02,
    min_ccount: float = 1.0,
    keep_recent: int = 0,
) -> SLAMState:
    """Reclaims arena slots and refreshes the state caches.

    policy='voxel': near-duplicate points (same ``voxel_size`` cell)
    collapse into one confidence-weighted point — no observations
    discarded. policy='evict': drop points with ccount < ``min_ccount``
    (except the ``keep_recent`` newest) — Keller §4.3 unstable-point
    removal.
    """
    if policy == "voxel":
        m = voxel_compact_map(state.map_state, voxel_size)
    elif policy == "evict":
        m = compact_map(
            state.map_state, min_ccount=min_ccount, keep_recent=keep_recent
        )
    else:
        raise ValueError(f"policy must be 'voxel' or 'evict', got {policy!r}")
    return refresh_slam_state(
        state._replace(map_state=m), intrinsics, opts, H, W
    )


@functools.partial(jax.jit, static_argnames=("opts", "has_poses"))
def _scan_segment(
    state: SLAMState,
    rgb_seq: jnp.ndarray,
    depth_seq: jnp.ndarray,
    intrinsics: jnp.ndarray,
    poses_seq: jnp.ndarray,
    opts: SLAMOptions,
    has_poses: bool,
) -> Tuple[SLAMState, jnp.ndarray]:
    """Continues the SLAM scan from ``state`` over a frame chunk."""
    xs = (
        jnp.swapaxes(rgb_seq, 0, 1),
        jnp.swapaxes(depth_seq, 0, 1),
        jnp.swapaxes(poses_seq, 0, 1),
    )

    def body(carry, x):
        rgb, depth, gt_pose = x
        new = slam_step_state(
            carry, rgb, depth, intrinsics, opts,
            gt_pose if (opts.odom == "gt" and has_poses) else None,
        )
        return new, new.pose

    state, poses = jax.lax.scan(body, state, xs)
    return state, jnp.swapaxes(poses, 0, 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "opts", "capacity", "segment_len", "policy", "voxel_size",
        "min_ccount", "keep_recent", "has_poses",
    ),
)
def _sequence_compacted(
    rgb_seq, depth_seq, intrinsics, poses_seq, opts, capacity,
    segment_len, policy, voxel_size, min_ccount, keep_recent, has_poses,
):
    B, L, H, W, _ = rgb_seq.shape

    def _compact_refresh(st):
        if policy == "voxel":
            m = voxel_compact_map(st.map_state, voxel_size)
        else:
            m = compact_map(
                st.map_state, min_ccount=min_ccount, keep_recent=keep_recent
            )
        return refresh_slam_state(
            st._replace(map_state=m), intrinsics, opts, H, W
        )

    def step(carry, x):
        rgb, depth, gt_pose = x
        new = slam_step_state(
            carry, rgb, depth, intrinsics, opts,
            gt_pose if (opts.odom == "gt" and has_poses) else None,
        )
        return new, new.pose

    def chunk_xs(t0, t1):
        return (
            jnp.swapaxes(rgb_seq[:, t0:t1], 0, 1),
            jnp.swapaxes(depth_seq[:, t0:t1], 0, 1),
            jnp.swapaxes(poses_seq[:, t0:t1], 0, 1),
        )

    state = slam_init_state(
        rgb_seq[:, 0], depth_seq[:, 0], intrinsics, opts, capacity,
        poses_seq[:, 0] if has_poses else None,
    )
    poses_parts = [state.pose[:, None]]
    peaks = []

    # prologue: the remainder frames plus (when L-1 divides evenly) the
    # first full segment — so the arena is never compacted while still
    # holding only the init frame
    rem = (L - 1) % segment_len if segment_len < L else L - 1
    pro = rem if rem else min(segment_len, L - 1)
    if pro:
        state, p = jax.lax.scan(step, state, chunk_xs(1, 1 + pro))
        poses_parts.append(jnp.swapaxes(p, 0, 1))

    n_seg = (L - 1 - pro) // segment_len
    if n_seg:
        seg_rgb = jnp.swapaxes(rgb_seq[:, 1 + pro:], 0, 1).reshape(
            n_seg, segment_len, B, H, W, 3
        )
        seg_dep = jnp.swapaxes(depth_seq[:, 1 + pro:], 0, 1).reshape(
            n_seg, segment_len, B, H, W, 1
        )
        seg_pos = jnp.swapaxes(poses_seq[:, 1 + pro:], 0, 1).reshape(
            n_seg, segment_len, B, 4, 4
        )

        def outer(carry, xs):
            # entry live count == the previous segment's (monotonic) peak
            entry_peak = jnp.max(carry.map_state.num_points)
            st = _compact_refresh(carry)
            st, p = jax.lax.scan(step, st, xs)
            return st, (p, entry_peak)

        state, (p_all, seg_peaks) = jax.lax.scan(
            outer, state, (seg_rgb, seg_dep, seg_pos)
        )
        # (n_seg, seg, B, 4, 4) -> (B, n_seg*seg, 4, 4)
        p_all = jnp.moveaxis(p_all, 2, 0).reshape(B, n_seg * segment_len, 4, 4)
        poses_parts.append(p_all)
        peaks.append(jnp.max(seg_peaks))

    peaks.append(jnp.max(state.map_state.num_points))
    peak_live = jnp.stack(peaks).max()
    return state.map_state, jnp.concatenate(poses_parts, axis=1), peak_live


def slam_sequence_compacted(
    rgb_seq: jnp.ndarray,
    depth_seq: jnp.ndarray,
    intrinsics: jnp.ndarray,
    poses_seq: Optional[jnp.ndarray],
    opts: SLAMOptions,
    capacity: int,
    segment_len: int = 4,
    policy: str = "voxel",
    voxel_size: float = 0.01,
    min_ccount: float = 1.0,
    keep_recent: int = 0,
) -> Tuple[MapState, jnp.ndarray, jnp.ndarray]:
    """Fused-program arena lifecycle: ONE jitted scan-of-scans that
    compacts the arena unconditionally every ``segment_len`` frames.

    :func:`slam_sequence_managed` decides WHETHER to compact on the host
    (one scalar sync per boundary) — adaptive, but on a remote backend
    each boundary costs a host round-trip plus a separate program
    dispatch (~25-45 ms each). This variant trades the adaptivity away:
    compaction + state refresh run unconditionally at every segment
    boundary INSIDE one compiled program (outer ``lax.scan`` over
    segments, inner over frames), so a long sequence keeps the fused
    scan's single-dispatch cost. No ``lax.cond`` touches the arena (see
    module docstring — conds copy it); the compaction simply always runs.

    Use when the per-boundary compaction is known to pay for itself —
    e.g. the ScanNet operating point, where upsampled/noisy depth makes
    fusion append co-located duplicates and the voxel merge shrinks the
    live set ~20x (tools/bench_scannet.py --fused-managed), keeping the
    ``assoc_window`` working set small and valid.

    Returns:
        (map_state, poses (B, L, 4, 4), peak_live): ``peak_live`` is the
        maximum live count ever reached (arena growth is monotonic
        between boundaries, so boundary entry/exit counts capture the
        true peak) — callers using ``opts.assoc_window`` should assert
        ``peak_live <= assoc_window`` to certify no association drops.
        CAVEAT: ``num_points`` saturates at ``capacity`` (masked appends
        past capacity are silently dropped), so additionally assert
        ``peak_live < capacity`` — a saturated arena passes the window
        check while appends were being dropped mid-segment.
    """
    if segment_len < 1:
        raise ValueError(f"segment_len must be >= 1, got {segment_len}")
    if policy not in ("voxel", "evict"):
        raise ValueError(f"policy must be 'voxel' or 'evict', got {policy!r}")
    if not opts.fusion and opts.odom_targets == "recent" and opts.odom != "gt":
        raise ValueError(
            "odom_targets='recent' depends on append recency, which "
            "compaction destroys — use odom_targets='map' (or fusion) "
            "with a compacting lifecycle"
        )
    B, L = rgb_seq.shape[:2]
    if opts.odom == "gt" and poses_seq is None:
        raise ValueError("gt odometry requires poses")
    has_poses = poses_seq is not None
    if not has_poses:
        poses_seq = jnp.zeros((B, L, 4, 4), rgb_seq.dtype)
    return _sequence_compacted(
        rgb_seq, depth_seq, intrinsics, poses_seq, opts, capacity,
        segment_len, policy, voxel_size, min_ccount, keep_recent, has_poses,
    )


def slam_sequence_managed(
    rgb_seq: jnp.ndarray,
    depth_seq: jnp.ndarray,
    intrinsics: jnp.ndarray,
    poses_seq: Optional[jnp.ndarray],
    opts: SLAMOptions,
    capacity: int,
    watermark: float = 0.9,
    segment_len: int = 8,
    policy: str = "voxel",
    voxel_size: float = 0.02,
    min_ccount: float = 1.0,
    keep_recent: int = 0,
    loop_closure: Optional[str] = None,
    loop_closure_kwargs: Optional[dict] = None,
    resume_from: Optional[Tuple[MapState, jnp.ndarray]] = None,
) -> Tuple[MapState, jnp.ndarray]:
    """:func:`slam_sequence` with in-loop arena lifecycle management.

    Runs the fused scan in host-level segments of ``segment_len`` frames;
    after each segment, if any batch item's live count exceeds
    ``watermark * capacity``, the arena is compacted (``policy``) and the
    state caches refreshed — so a long run degrades gracefully (bounded
    density/confidence loss) instead of silently dropping every append
    past capacity.

    One scalar host sync per segment; no ``lax.cond`` ever touches the
    arena (see module docstring).

    With ``loop_closure`` set ('pose', 'appearance' or 'both'), loop
    detection + verification + pose-graph correction
    (:func:`~gradslam_tpu.slam.loopclosure.close_loops`) runs at every
    segment boundary — where the host sync already exists — over the
    trajectory so far. When a loop edge is accepted, the whole past
    trajectory is refined AND the live tracking pose jumps to its
    corrected value (the state caches are rebuilt at the new pose), so
    drift is removed DURING the run instead of only in a post-hoc pass.
    The already-fused map is not re-deformed (standard for point-based
    fusion; re-observed geometry re-fuses at the corrected poses).
    Appearance detection uses the viewpoint-robust
    :func:`~gradslam_tpu.slam.loopclosure.keyframe_descriptors_invariant`.
    ``loop_closure_kwargs`` forwards thresholds (``max_candidates``,
    ``min_separation``, ``max_descriptor_dist``, ``min_inlier_frac``,
    ``dsratio``...).

    With ``resume_from`` = ``(map_state, pose)`` — e.g. loaded by
    :func:`gradslam_tpu.utils.checkpoint.load_slam_state` in a fresh
    process — the run CONTINUES from that state instead of mapping frame
    0 into a fresh arena: every frame of ``rgb_seq`` is treated as a
    continuation frame, and the slot-referencing caches (odometry
    candidates, projective model image) are rebuilt from the arena by
    :func:`refresh_slam_state` before the first segment. A checkpoint
    taken at a segment boundary where the uninterrupted run compacts
    resumes to the BITWISE-identical state (compaction's own refresh is
    exactly this rebuild); elsewhere the rebuilt model image uses the
    occlusion-correct min-depth rule rather than the in-flight fusion
    image, so the first resumed frame's odometry may differ at
    association-tie level (the map and all appended geometry are exact
    either way). Pinned by
    ``tests/slam/test_lifecycle.py::TestManagedResume``. Loop-closure
    bookkeeping starts fresh at the resume point (the trajectory before
    the checkpoint is not re-refined).

    Returns:
        (map_state, recovered_poses): poses cover frames of ``rgb_seq``
        (shape (B, L, 4, 4)).
    """
    if not 0.0 < watermark <= 1.0:
        raise ValueError(f"watermark must be in (0, 1], got {watermark}")
    if segment_len < 1:
        raise ValueError(f"segment_len must be >= 1, got {segment_len}")
    if loop_closure is not None and loop_closure not in (
        "pose", "appearance", "both"
    ):
        raise ValueError(
            "loop_closure must be None, 'pose', 'appearance' or 'both', "
            f"got {loop_closure!r}"
        )
    if not opts.fusion and opts.odom_targets == "recent" and opts.odom != "gt":
        raise ValueError(
            "odom_targets='recent' depends on append recency, which "
            "compaction destroys — use odom_targets='map' (or fusion) "
            "with the managed lifecycle"
        )
    B, L, H, W, _ = rgb_seq.shape
    dtype = rgb_seq.dtype
    if opts.odom == "gt" and poses_seq is None:
        raise ValueError("gt odometry requires poses")
    has_poses = poses_seq is not None
    if not has_poses:
        poses_seq = jnp.zeros((B, L, 4, 4), dtype)

    lc_kwargs = dict(loop_closure_kwargs or {})
    lc_dsratio = lc_kwargs.pop("dsratio", opts.dsratio or 4)
    lc_clouds = None
    if loop_closure is not None:
        from .loopclosure import (
            close_loops,
            frame_clouds_from_rgbd,
            keyframe_descriptors_invariant,
        )

        # camera-frame per-keyframe clouds for the WHOLE sequence,
        # computed once (pose-independent — reusable at every boundary)
        lc_pts, lc_nrm, lc_val, _, _ = frame_clouds_from_rgbd(
            depth_seq, intrinsics, lc_dsratio
        )
        lc_clouds = (lc_pts, lc_nrm, lc_val)

    def _close_loops_so_far(poses_btl):
        """Runs close_loops per batch item over frames [0, t); returns
        (refined poses, any_accepted)."""
        lc_pts, lc_nrm, lc_val = lc_clouds
        t_now = poses_btl.shape[1]
        refined, hit = [], False
        for b in range(B):
            descs = None
            if loop_closure in ("appearance", "both"):
                descs = keyframe_descriptors_invariant(
                    lc_pts[b, :t_now], lc_nrm[b, :t_now], lc_val[b, :t_now]
                )
            r, _, w = close_loops(
                poses_btl[b],
                lc_pts[b, :t_now],
                lc_nrm[b, :t_now],
                lc_val[b, :t_now],
                detection=loop_closure,
                **({} if descs is None else {"descriptors": descs}),
                **lc_kwargs,
            )
            hit = hit or bool((w > 0).any())
            refined.append(r)
        return jnp.stack(refined), hit

    if resume_from is not None:
        m0, pose0 = resume_from
        if m0.capacity != capacity:
            raise ValueError(
                f"resume_from arena capacity {m0.capacity} != requested "
                f"capacity {capacity}"
            )
        A = opts.active_capacity or 2 * H * W
        from .fusionutils import _resolve_model_rows

        dense = _resolve_model_rows(opts.model_rows, H, W, capacity)
        state = refresh_slam_state(
            SLAMState(
                map_state=m0,
                pose=jnp.asarray(pose0),
                cand_slots=jnp.zeros((B, A), jnp.int32),
                cand_valid=jnp.zeros((B, A), bool),
                app_start=m0.num_points,
                model_img=jnp.full((B, H * W), capacity, jnp.int32),
                model_rows=(
                    jnp.zeros((B, H * W, 7), dtype) if dense else None
                ),
            ),
            intrinsics, opts, H, W,
        )
        poses_out = []
        t = 0
    else:
        state = slam_init_state(
            rgb_seq[:, 0], depth_seq[:, 0], intrinsics, opts, capacity,
            poses_seq[:, 0] if has_poses else None,
        )
        poses_out = [state.pose[:, None]]
        t = 1
    while t < L:
        if float(jnp.max(state.map_state.num_points)) > watermark * capacity:
            state = compact_slam_state(
                state, intrinsics, opts, H, W,
                policy=policy, voxel_size=voxel_size,
                min_ccount=min_ccount, keep_recent=keep_recent,
            )
        end = min(t + segment_len, L)
        state, seg_poses = _scan_segment(
            state,
            rgb_seq[:, t:end],
            depth_seq[:, t:end],
            intrinsics,
            poses_seq[:, t:end],
            opts,
            has_poses,
        )
        poses_out.append(seg_poses)
        t = end
        # in-loop closure at the segment boundary (skip the final
        # boundary: the caller can close the full trajectory post-hoc,
        # and there is no further tracking to correct)
        if loop_closure is not None and t > 2 and t < L:
            poses_btl = jnp.concatenate(poses_out, axis=1)
            refined, hit = _close_loops_so_far(poses_btl)
            if hit:
                poses_out = [refined]
                # jump the live tracking pose to its corrected value and
                # rebuild the pose-dependent caches
                state = refresh_slam_state(
                    state._replace(pose=refined[:, -1]),
                    intrinsics, opts, H, W,
                )
    poses_btl = jnp.concatenate(poses_out, axis=1)
    if loop_closure is not None and L > 2:
        refined, hit = _close_loops_so_far(poses_btl)
        if hit:
            poses_btl = refined
    return state.map_state, poses_btl
