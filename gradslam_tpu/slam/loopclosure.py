"""Loop closure: detection, ICP verification, and pose-graph correction.

Net-new capability beyond the reference (which processes frames strictly
serially and never revisits — gradslam/slam/icpslam.py:125): odometry
drift accumulates without bound on long trajectories; closing loops
against revisited views removes it. TPU-first design: detection is a
dense (L, L) pose-proximity test + static-shape ``top_k`` (no
data-dependent candidate lists), verification runs ONE batched gradICP
solve over all K candidate pairs at once (the solvers are natively
batched), and correction reuses the distributed pose-graph Gauss-Newton
(parallel/pose_refine.py — edges shard over a mesh, Hessians psum).

Everything is jit-compatible; rejected/padded candidates carry weight 0
through the pose graph (static shapes end to end).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry import (
    inverse_transformation,
    relative_transformation,
    transform_pointcloud,
)
from ..odometry.icputils import point_to_plane_gradICP
from ..parallel.pose_refine import PoseGraph, pose_graph_refine

__all__ = [
    "LoopCandidates",
    "keyframe_descriptors",
    "detect_loop_closures",
    "detect_loop_closures_descriptor",
    "verify_loop_closures",
    "close_loops",
    "close_loops_rgbd",
]


class LoopCandidates(NamedTuple):
    """K candidate loop-closure pairs (static shape; invalid slots have
    ``valid = False``).

    Attributes:
        edges: (K, 2) int32 keyframe index pairs (i < j).
        valid: (K,) bool.
    """

    edges: jnp.ndarray
    valid: jnp.ndarray


def _rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle of (..., 3, 3) matrices (radians)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))


@functools.partial(jax.jit, static_argnames=("max_candidates",))
def detect_loop_closures(
    poses: jnp.ndarray,
    max_candidates: int = 8,
    min_separation: int = 5,
    max_distance: float = 0.5,
    max_angle: float = 1.0472,  # 60 degrees
) -> LoopCandidates:
    """Finds keyframe pairs whose (drifted) poses revisit the same view.

    Dense (L, L) proximity test — translation distance below
    ``max_distance`` AND relative rotation below ``max_angle`` AND
    temporal separation of at least ``min_separation`` frames — then the
    ``max_candidates`` closest pairs are selected with ``top_k``
    (deterministic, static shape).

    Args:
        poses: (L, 4, 4) world-from-keyframe poses (e.g. SLAM output).

    Returns:
        LoopCandidates with (K, 2) index pairs, i < j.
    """
    L = poses.shape[0]
    t = poses[..., :3, 3]
    dist = jnp.linalg.norm(t[:, None] - t[None, :], axis=-1)  # (L, L)
    R = poses[..., :3, :3]
    rel_ang = _rotation_angle(
        jnp.einsum("iab,jac->ijbc", R, R)  # R_i^T R_j
    )
    sep = jnp.arange(L)[None, :] - jnp.arange(L)[:, None]  # j - i
    ok = (
        (sep >= min_separation)
        & (dist < max_distance)
        & (rel_ang < max_angle)
    )
    score = jnp.where(ok, -dist, -jnp.inf).reshape(-1)
    k = min(max_candidates, L * L)
    top, flat_idx = jax.lax.top_k(score, k)
    i = (flat_idx // L).astype(jnp.int32)
    j = (flat_idx % L).astype(jnp.int32)
    return LoopCandidates(
        edges=jnp.stack([i, j], axis=-1), valid=jnp.isfinite(top)
    )


@functools.partial(jax.jit, static_argnames=("grid",))
def keyframe_descriptors(
    depth: jnp.ndarray,
    normals: jnp.ndarray,
    valid: jnp.ndarray,
    grid: Tuple[int, int] = (6, 8),
) -> jnp.ndarray:
    """Pose-independent per-keyframe appearance/geometry descriptor.

    Pose-proximity detection (:func:`detect_loop_closures`) fails exactly
    when drift is large — the regime loop closure exists for. This
    descriptor is computed purely from the CAMERA-frame depth and normal
    maps, so it is untouched by pose drift: a coarse ``grid`` of
    (masked mean depth, masked mean normal, valid-coverage fraction) per
    cell. Similar views produce similar descriptors regardless of where
    the estimator currently believes the camera is.

    Args:
        depth: (L, H, W) metric depth; normals: (L, H, W, 3) camera-frame
            unit normals; valid: (L, H, W) bool.
        grid: (gh, gw) descriptor resolution.

    Returns:
        (L, gh*gw*5) float descriptors.
    """
    L, H, W = depth.shape
    gh, gw = grid
    Hc, Wc = (H // gh) * gh, (W // gw) * gw
    cell = (Hc // gh) * (Wc // gw)

    d = depth[:, :Hc, :Wc].reshape(L, gh, Hc // gh, gw, Wc // gw)
    v = valid[:, :Hc, :Wc].reshape(L, gh, Hc // gh, gw, Wc // gw)
    n = normals[:, :Hc, :Wc].reshape(L, gh, Hc // gh, gw, Wc // gw, 3)
    vf = v.astype(depth.dtype)
    cnt = vf.sum((2, 4))  # (L, gh, gw)
    denom = jnp.maximum(cnt, 1.0)
    mean_d = (d * vf).sum((2, 4)) / denom
    mean_n = (n * vf[..., None]).sum((2, 4)) / denom[..., None]
    frac = cnt / cell
    return jnp.concatenate(
        [
            mean_d.reshape(L, -1),
            mean_n.reshape(L, -1),
            frac.reshape(L, -1),
        ],
        axis=-1,
    )


@functools.partial(jax.jit, static_argnames=("max_candidates",))
def detect_loop_closures_descriptor(
    descriptors: jnp.ndarray,
    max_candidates: int = 8,
    min_separation: int = 5,
    max_descriptor_dist: float = 0.25,
) -> LoopCandidates:
    """Drift-robust detection: dense (L, L) descriptor similarity.

    Candidates are keyframe pairs whose :func:`keyframe_descriptors` RMS
    difference is below ``max_descriptor_dist`` — purely appearance/
    geometry-based, immune to pose drift (complements
    :func:`detect_loop_closures`, which trusts the drifted poses). The
    ``max_candidates`` most similar pairs are selected with ``top_k``.

    Returns:
        LoopCandidates with (K, 2) index pairs, i < j.
    """
    L, D = descriptors.shape
    diff = descriptors[:, None] - descriptors[None, :]
    rms = jnp.sqrt(jnp.mean(diff**2, axis=-1))  # (L, L)
    sep = jnp.arange(L)[None, :] - jnp.arange(L)[:, None]  # j - i
    ok = (sep >= min_separation) & (rms < max_descriptor_dist)
    score = jnp.where(ok, -rms, -jnp.inf).reshape(-1)
    k = min(max_candidates, L * L)
    top, flat_idx = jax.lax.top_k(score, k)
    i = (flat_idx // L).astype(jnp.int32)
    j = (flat_idx % L).astype(jnp.int32)
    return LoopCandidates(
        edges=jnp.stack([i, j], axis=-1), valid=jnp.isfinite(top)
    )


def verify_loop_closures(
    candidates: LoopCandidates,
    poses: jnp.ndarray,
    frame_points: jnp.ndarray,
    frame_normals: jnp.ndarray,
    frame_valid: jnp.ndarray,
    numiters: int = 20,
    dist_thresh: Optional[float] = None,
    inlier_dist: float = 0.05,
    min_inlier_frac: float = 0.5,
    init: str = "poses",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Refines each candidate's relative pose with ICP and scores it.

    All K candidates solve in ONE batched gradICP call: source = frame j's
    points brought into frame i via the initialization, target = frame
    i's points. A candidate is accepted when at least ``min_inlier_frac``
    of valid source points land within ``inlier_dist`` of their nearest
    target after alignment.

    Args:
        poses: (L, 4, 4) current pose estimates.
        frame_points / frame_normals: (L, N, 3) per-keyframe CAMERA-frame
            point/normal sets (e.g. strided vertex-map subsamples).
        frame_valid: (L, N) bool.
        init: ICP initialization — ``'poses'`` seeds with the current
            (possibly drifted) relative estimate; ``'identity'`` seeds
            with I (for appearance-detected candidates, whose pose
            estimates are by construction untrustworthy and whose true
            relative transform is near-identity for a genuine revisit).

    Returns:
        (measurements (K, 4, 4), weights (K,)): relative transforms
        ``Z_ij ~ T_i^-1 T_j`` and acceptance weights (0 for rejected or
        invalid candidates) — ready for :class:`PoseGraph` edges.
    """
    if init not in ("poses", "identity"):
        raise ValueError(f"init must be 'poses' or 'identity', got {init!r}")
    i = candidates.edges[:, 0]
    j = candidates.edges[:, 1]
    K = i.shape[0]

    if init == "poses":
        # initial relative pose from the current trajectory
        Z0 = jax.vmap(
            lambda Ti, Tj: jnp.matmul(inverse_transformation(Ti), Tj)
        )(poses[i], poses[j])  # (K, 4, 4)
    else:
        Z0 = jnp.broadcast_to(
            jnp.eye(4, dtype=poses.dtype), (K, 4, 4)
        )

    src = frame_points[j]  # (K, N, 3) camera frame of j
    src_valid = frame_valid[j]
    tgt = frame_points[i]
    tgt_n = frame_normals[i]
    tgt_valid = frame_valid[i]

    # ICP aligns src (frame j points) onto tgt (frame i points); with the
    # camera-frame clouds the recovered transform IS Z_ij
    Z = point_to_plane_gradICP(
        src,
        tgt,
        tgt_n,
        Z0,
        numiters=numiters,
        dist_thresh=dist_thresh,
        src_valid=src_valid.astype(src.dtype),
        tgt_valid=tgt_valid,
    )  # (K, 4, 4)

    # inlier scoring after alignment: nearest-neighbor distances of the
    # aligned source points
    from ..ops.knn import knn

    aligned = transform_pointcloud(src, Z)
    sq_d, _ = knn(aligned, tgt, tgt_valid)
    inlier = (sq_d < inlier_dist**2) & src_valid & jnp.isfinite(sq_d)
    n_valid = jnp.maximum(jnp.sum(src_valid, axis=-1), 1)
    frac = jnp.sum(inlier, axis=-1) / n_valid
    accept = (frac >= min_inlier_frac) & candidates.valid
    return Z, accept.astype(src.dtype)


def close_loops(
    poses: jnp.ndarray,
    frame_points: jnp.ndarray,
    frame_normals: jnp.ndarray,
    frame_valid: jnp.ndarray,
    max_candidates: int = 8,
    min_separation: int = 5,
    max_distance: float = 0.5,
    max_angle: float = 1.0472,
    icp_numiters: int = 20,
    inlier_dist: float = 0.05,
    min_inlier_frac: float = 0.5,
    refine_iters: int = 10,
    odometry_weight: float = 1.0,
    loop_weight: float = 1.0,
    detection: str = "pose",
    descriptors: Optional[jnp.ndarray] = None,
    max_descriptor_dist: float = 0.25,
) -> Tuple[jnp.ndarray, LoopCandidates, jnp.ndarray]:
    """Detect, verify, and correct: the full loop-closure pipeline.

    Builds a pose graph from consecutive-frame odometry edges (measured
    from the input trajectory) plus ICP-verified loop edges, and runs
    Gauss-Newton (parallel/pose_refine.py). With no accepted loop edges
    the input trajectory is already the optimum of the chain graph and is
    returned (numerically) unchanged.

    Args:
        poses: (L, 4, 4) drifted trajectory (single sequence; vmap for a
            batch).
        frame_points / frame_normals / frame_valid: per-keyframe
            camera-frame point sets, (L, N, 3) / (L, N, 3) / (L, N).
        detection: candidate source — ``'pose'`` (proximity of the
            current estimates; fails under large drift), ``'appearance'``
            (:func:`detect_loop_closures_descriptor` on pose-independent
            ``descriptors``; drift-robust), or ``'both'`` (union; each
            set ICP-verified with its matching initialization).
        descriptors: (L, D) :func:`keyframe_descriptors` output, required
            for ``detection in ('appearance', 'both')``.

    Returns:
        (refined_poses (L, 4, 4), candidates, loop_weights (K,)) —
        K = ``max_candidates`` per active detector.
    """
    if detection not in ("pose", "appearance", "both"):
        raise ValueError(
            f"detection must be 'pose', 'appearance' or 'both', got "
            f"{detection!r}"
        )
    if detection in ("appearance", "both") and descriptors is None:
        raise ValueError(
            f"detection={detection!r} requires descriptors "
            "(keyframe_descriptors output)"
        )
    L = poses.shape[0]

    cand_sets = []
    if detection in ("pose", "both"):
        cand_sets.append(
            (
                detect_loop_closures(
                    poses,
                    max_candidates=max_candidates,
                    min_separation=min_separation,
                    max_distance=max_distance,
                    max_angle=max_angle,
                ),
                "poses",
            )
        )
    if detection in ("appearance", "both"):
        cand_sets.append(
            (
                detect_loop_closures_descriptor(
                    descriptors,
                    max_candidates=max_candidates,
                    min_separation=min_separation,
                    max_descriptor_dist=max_descriptor_dist,
                ),
                "identity",
            )
        )

    Z_parts, w_parts, edge_parts, valid_parts = [], [], [], []
    for cand_i, init in cand_sets:
        Z_i, w_i = verify_loop_closures(
            cand_i,
            poses,
            frame_points,
            frame_normals,
            frame_valid,
            numiters=icp_numiters,
            inlier_dist=inlier_dist,
            min_inlier_frac=min_inlier_frac,
            init=init,
        )
        Z_parts.append(Z_i)
        w_parts.append(w_i)
        edge_parts.append(cand_i.edges)
        valid_parts.append(cand_i.valid)
    cand = LoopCandidates(
        edges=jnp.concatenate(edge_parts, axis=0),
        valid=jnp.concatenate(valid_parts, axis=0),
    )
    Z_loop = jnp.concatenate(Z_parts, axis=0)
    w_loop = jnp.concatenate(w_parts, axis=0)

    # odometry edges from the input trajectory
    edges_odo = jnp.stack(
        [jnp.arange(L - 1), jnp.arange(1, L)], axis=-1
    ).astype(jnp.int32)
    Z_odo = relative_transformation(
        poses[:-1], poses[1:], orthogonal_rotations=True
    )

    graph = PoseGraph(
        poses=poses,
        edges=jnp.concatenate([edges_odo, cand.edges], axis=0),
        measurements=jnp.concatenate([Z_odo, Z_loop], axis=0),
        weights=jnp.concatenate(
            [
                jnp.full((L - 1,), odometry_weight, poses.dtype),
                w_loop * loop_weight,
            ]
        ),
    )
    refined = pose_graph_refine(graph, num_iters=refine_iters)
    return refined, cand, w_loop


def close_loops_rgbd(
    rgb_seq: jnp.ndarray,
    depth_seq: jnp.ndarray,
    intrinsics: jnp.ndarray,
    poses: jnp.ndarray,
    dsratio: int = 4,
    **kwargs,
) -> jnp.ndarray:
    """Loop-closes a SLAM trajectory directly from the RGB-D inputs.

    Convenience wrapper over :func:`close_loops`: per-keyframe
    camera-frame clouds are the strided-subsampled vertex/normal maps
    (the same downsampling the odometry uses). One call after
    ``slam_sequence``:

        map_state, poses = slam_sequence(rgb, depth, K, None, opts, cap)
        poses = close_loops_rgbd(rgb, depth, K, poses)

    Args:
        rgb_seq: (B, L, H, W, 3); depth_seq: (B, L, H, W, 1).
        intrinsics: (B, 1, 4, 4); poses: (B, L, 4, 4) recovered trajectory.
        dsratio: vertex-map subsampling stride.
        **kwargs: forwarded to :func:`close_loops` (detection thresholds,
            ICP iterations, weights).

    Returns:
        (B, L, 4, 4) refined trajectory.
    """
    from ..structures.rgbdimages import (
        compute_normal_map,
        compute_vertex_map,
        valid_depth_mask,
    )

    B, L, H, W, _ = rgb_seq.shape
    vm = compute_vertex_map(depth_seq, intrinsics)  # (B, L, H, W, 3)
    valid = valid_depth_mask(depth_seq)
    nm = compute_normal_map(vm, valid)
    sl = (slice(None), slice(None), slice(None, None, dsratio),
          slice(None, None, dsratio))
    pts = vm[sl].reshape(B, L, -1, 3)
    nrm = nm[sl].reshape(B, L, -1, 3)
    val = valid[sl].reshape(B, L, -1)

    # pose-independent appearance descriptors for drift-robust detection
    descs = None
    if kwargs.get("detection", "pose") in ("appearance", "both"):
        valid2 = valid[..., 0]  # (B, L, H, W)
        descs = [
            keyframe_descriptors(
                depth_seq[b, ..., 0], nm[b], valid2[b]
            )
            for b in range(B)
        ]

    # host-level loop over the (small) batch: keeps the batched-ICP
    # verification and the Pallas KNN at their native rank
    refined = [
        close_loops(
            poses[b], pts[b], nrm[b], val[b],
            **({} if descs is None else {"descriptors": descs[b]}),
            **kwargs,
        )[0]
        for b in range(B)
    ]
    return jnp.stack(refined)
