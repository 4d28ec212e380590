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
    "frame_clouds_from_rgbd",
    "keyframe_descriptors",
    "keyframe_descriptors_invariant",
    "detect_loop_closures",
    "detect_loop_closures_descriptor",
    "verify_loop_closures",
    "close_loops",
    "close_loops_batched",
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

    Depth cells are divided by the frame's median valid depth, so every
    descriptor component is dimensionless and O(1) — one
    ``max_descriptor_dist`` threshold behaves the same at desk scale and
    warehouse scale (without this, the metric-depth term dominated the
    RMS and the threshold was scene-scale-dependent).

    NOTE: grid cells do not correspond under viewpoint change — this
    descriptor is drift-robust but NOT rotation-robust. For revisits at
    a different yaw use :func:`keyframe_descriptors_invariant`.

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

    # per-frame median valid depth (masked median via sort)
    flat_d = depth.reshape(L, -1)
    flat_v = valid.reshape(L, -1)
    nvalid = flat_v.sum(-1)
    sorted_d = jnp.sort(jnp.where(flat_v, flat_d, jnp.inf), axis=-1)
    mid = jnp.maximum(nvalid - 1, 0) // 2
    med = jnp.take_along_axis(sorted_d, mid[:, None], axis=-1)[:, 0]
    med = jnp.where((nvalid > 0) & jnp.isfinite(med), med, 1.0)

    return jnp.concatenate(
        [
            (mean_d / med[:, None, None]).reshape(L, -1),
            mean_n.reshape(L, -1),
            frac.reshape(L, -1),
        ],
        axis=-1,
    )


@functools.partial(jax.jit, static_argnames=("n_sample", "bins"))
def keyframe_descriptors_invariant(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    valid: jnp.ndarray,
    n_sample: int = 128,
    bins: int = 16,
) -> jnp.ndarray:
    """Viewpoint-robust per-keyframe descriptor from pairwise geometry.

    :func:`keyframe_descriptors` is drift-robust but its grid cells stop
    corresponding when the revisit happens at a different yaw or a
    moderate translation. This descriptor is built ONLY from quantities
    invariant under rigid camera motion of the visible point set —
    pairwise point distances, pairwise normal angles, and
    point-to-centroid distances — as normalized histograms (a coarse
    point-feature-histogram in the spirit of Rusu et al.'s PFH/VFH).
    Two views of the same scene region produce similar descriptors at
    ANY relative orientation; what changes the descriptor is seeing
    different geometry, which is exactly the discriminating signal.

    Distances are normalized by the SEQUENCE-pooled mean pairwise
    distance (not per-frame): the descriptor stays dimensionless (one
    threshold works at desk scale and warehouse scale) while
    frame-to-frame differences in absolute extent — often the strongest
    place signal — are preserved. Per-frame normalization was tried and
    rejected: it collapses every view of a roughly-isotropic scene onto
    nearly the same histogram.

    Args:
        points: (L, N, 3) CAMERA-frame per-keyframe point sets (e.g. the
            strided vertex-map subsamples used for verification).
        normals: (L, N, 3) camera-frame unit normals.
        valid: (L, N) bool.
        n_sample: points subsampled per frame (pairwise cost is
            O(n_sample^2) per keyframe).
        bins: histogram resolution.

    Returns:
        (L, 4*bins) float descriptors (each histogram sums to 1):
        pairwise distances, pairwise normal angles, normal-vs-chord
        angles (the PFH "alpha" feature — surface-curvature layout), and
        point-to-centroid distances.
    """
    dtype = points.dtype
    eps = 1e-12

    def features(p, n, v):
        # deterministic spread subsample of the valid points: valid
        # entries first (stable), then n_sample evenly spaced picks
        order = jnp.argsort(jnp.where(v, 0, 1), stable=True)
        cnt = v.sum()
        pos = jnp.floor(
            jnp.linspace(0.0, 1.0, n_sample) * jnp.maximum(cnt - 1, 0)
        ).astype(jnp.int32)
        sel = order[pos]
        sv = (jnp.arange(n_sample) < cnt) & (cnt > 0)
        p_s, n_s = p[sel], n[sel]

        pair_v = (sv[:, None] & sv[None, :]) & ~jnp.eye(n_sample, dtype=bool)
        wpair = pair_v.astype(dtype).reshape(-1)

        diff = p_s[:, None] - p_s[None, :] + eps
        D = jnp.linalg.norm(diff, axis=-1)
        # PFH alpha: |cos| of the angle between a point's normal and the
        # chord to its pair partner (sign-insensitive: normal
        # orientation conventions differ between views)
        alpha = jnp.abs(
            jnp.einsum("ija,ia->ij", diff, n_s)
        ) / jnp.maximum(D, eps)
        ndot = jnp.clip(
            jnp.einsum("ia,ja->ij", n_s, n_s), -1.0, 1.0
        ).reshape(-1)

        c = jnp.sum(p_s * sv[:, None], axis=0) / jnp.maximum(
            cnt.astype(dtype), 1.0
        )
        dc = jnp.linalg.norm(p_s - c + eps, axis=-1)
        wc = sv.astype(dtype)
        return D.reshape(-1), alpha.reshape(-1), ndot, dc, wpair, wc

    D, alpha, ndot, dc, wpair, wc = jax.vmap(features)(
        points, normals, valid
    )

    # sequence-pooled distance scale
    scale = jnp.sum(D * wpair) / jnp.maximum(jnp.sum(wpair), 1.0)
    Dn = D / jnp.maximum(scale, eps)
    scale_c = jnp.sum(dc * wc) / jnp.maximum(jnp.sum(wc), 1.0)
    dcn = dc / jnp.maximum(scale_c, eps)

    def hist(x, w, lo, hi):
        ix = jnp.clip(
            ((x - lo) / (hi - lo) * bins).astype(jnp.int32), 0, bins - 1
        )
        h = jax.vmap(
            lambda ixb, wb: jnp.zeros((bins,), dtype).at[ixb].add(wb)
        )(ix, w)
        return h / jnp.maximum(h.sum(-1, keepdims=True), eps)

    return jnp.concatenate(
        [
            hist(Dn, wpair, 0.0, 3.0),
            hist(ndot, wpair, -1.0, 1.0),
            hist(alpha, wpair, 0.0, 1.0),
            hist(dcn, wc, 0.0, 3.0),
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
    yaw_hypotheses: Tuple[float, ...] = (
        0.0, 0.5236, -0.5236, 1.0472, -1.0472, 1.5708, -1.5708,
    ),
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
            with I (for appearance-detected candidates whose pose
            estimates are untrustworthy and whose revisit is at roughly
            the original orientation); ``'multistart'`` seeds every
            candidate with each of ``yaw_hypotheses`` rotations about
            the camera up axis (one batched solve of K * H problems) and
            keeps the hypothesis with the best inlier fraction — for
            viewpoint-changed revisits, where ICP from identity falls
            into the wrong basin past ~20-30 degrees of yaw.
        yaw_hypotheses: radians, ``init='multistart'`` only. Default
            covers ±90° at 30° spacing.

    Returns:
        (measurements (K, 4, 4), weights (K,)): relative transforms
        ``Z_ij ~ T_i^-1 T_j`` and acceptance weights (0 for rejected or
        invalid candidates) — ready for :class:`PoseGraph` edges.
    """
    if init not in ("poses", "identity", "multistart"):
        raise ValueError(
            f"init must be 'poses', 'identity' or 'multistart', got {init!r}"
        )
    if init == "multistart" and dist_thresh is None:
        # a data-association gate is load-bearing for multistart: the
        # candidate views overlap only partially, and ungated
        # point-to-plane lets the non-overlapping points drag the solve
        # off the true alignment (measured: Z error 0.79 ungated vs
        # 0.006 gated at 3*inlier_dist on a 63%-overlap pair)
        dist_thresh = 3.0 * inlier_dist
    i = candidates.edges[:, 0]
    j = candidates.edges[:, 1]
    K = i.shape[0]
    dtype = poses.dtype

    if init == "poses":
        # initial relative pose from the current trajectory
        Z0 = jax.vmap(
            lambda Ti, Tj: jnp.matmul(inverse_transformation(Ti), Tj)
        )(poses[i], poses[j])  # (K, 4, 4)
        nh = 1
    elif init == "identity":
        Z0 = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (K, 4, 4))
        nh = 1
    else:  # multistart: yaw rotations about the camera up (y) axis
        ang = jnp.asarray(yaw_hypotheses, dtype)
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        nh = ang.shape[0]
        Z0 = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (nh, 4, 4))
        Z0 = Z0.at[:, 0, 0].set(ca).at[:, 0, 2].set(sa)
        Z0 = Z0.at[:, 2, 0].set(-sa).at[:, 2, 2].set(ca)
        # (K, H, 4, 4) -> (K*H, 4, 4)
        Z0 = jnp.broadcast_to(Z0[None], (K, nh, 4, 4)).reshape(-1, 4, 4)

    def expand(x):
        """Tiles per-candidate data over the hypothesis axis."""
        if nh == 1:
            return x
        return jnp.broadcast_to(
            x[:, None], (K, nh) + x.shape[1:]
        ).reshape((K * nh,) + x.shape[1:])

    src = expand(frame_points[j])  # (K*H, N, 3) camera frame of j
    src_valid = expand(frame_valid[j])
    tgt = expand(frame_points[i])
    tgt_n = expand(frame_normals[i])
    tgt_valid = expand(frame_valid[i])

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
    )  # (K*H, 4, 4)

    # inlier scoring after alignment: nearest-neighbor distances of the
    # aligned source points
    from ..ops.knn import knn

    aligned = transform_pointcloud(src, Z)
    sq_d, _ = knn(aligned, tgt, tgt_valid)
    inlier = (sq_d < inlier_dist**2) & src_valid & jnp.isfinite(sq_d)
    n_valid = jnp.maximum(jnp.sum(src_valid, axis=-1), 1)
    frac = jnp.sum(inlier, axis=-1) / n_valid  # (K*H,)

    if nh > 1:
        # keep the best hypothesis per candidate
        frac_kh = frac.reshape(K, nh)
        best = jnp.argmax(frac_kh, axis=-1)
        Z = Z.reshape(K, nh, 4, 4)[jnp.arange(K), best]
        frac = frac_kh[jnp.arange(K), best]

    accept = (frac >= min_inlier_frac) & candidates.valid
    return Z, accept.astype(dtype)


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
    appearance_init: str = "multistart",
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
            set ICP-verified with its matching initialization; pairs
            found by both detectors enter the pose graph ONCE — the
            duplicate's weight is zeroed so a double-detected closure is
            not double-counted).
        descriptors: (L, D) :func:`keyframe_descriptors` or
            :func:`keyframe_descriptors_invariant` output, required for
            ``detection in ('appearance', 'both')``.
        appearance_init: ICP seed for appearance-detected candidates —
            ``'multistart'`` (default: yaw-hypothesis sweep; handles
            revisits at a rotated viewpoint) or ``'identity'``.

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
                appearance_init,
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

    if len(cand_sets) > 1:
        # dedup across detectors: a pair found (and accepted) by both
        # would enter the pose graph as two edges, doubling its weight
        # relative to single-detector closures — zero the repeat (static
        # shapes: mask, don't filter).
        key = cand.edges[:, 0] * L + cand.edges[:, 1]
        live = w_loop > 0
        dup = (
            (key[:, None] == key[None, :])
            & live[:, None]
            & live[None, :]
            & (jnp.arange(key.shape[0])[:, None]
               > jnp.arange(key.shape[0])[None, :])
        ).any(axis=1)
        w_loop = jnp.where(dup, 0.0, w_loop)

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


def close_loops_batched(
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
    appearance_init: str = "multistart",
) -> Tuple[jnp.ndarray, LoopCandidates, jnp.ndarray]:
    """Batched :func:`close_loops` over (B, L, ...) inputs — one device
    program per stage instead of B.

    A host loop of per-item ``close_loops`` calls dispatches B detection
    programs, B ICP verifications and B pose-graph refinements per
    invocation — B times the per-stage dispatch cost (each dispatch to a
    remote backend costs ~ms). Here detection is ``vmap``-ed, ICP
    verification runs as ONE batched solve over all B*K candidates (the
    per-keyframe clouds flatten to a (B*L, N, 3) axis and candidate
    indices get per-item offsets — the gradICP solver and the KNN kernel
    are natively batched, so folding B into their batch axis is free),
    and Gauss-Newton refinement is ``vmap``-ed over the B pose graphs.

    Args / returns: as :func:`close_loops`, with a leading batch axis on
    ``poses`` (B, L, 4, 4), the frame arrays (B, L, N, ...),
    ``descriptors`` (B, L, D) and every output.
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
    B, L = poses.shape[:2]
    N = frame_points.shape[2]

    cand_sets = []
    if detection in ("pose", "both"):
        det = functools.partial(
            detect_loop_closures,
            max_candidates=max_candidates,
            min_separation=min_separation,
            max_distance=max_distance,
            max_angle=max_angle,
        )
        cand_sets.append((jax.vmap(det)(poses), "poses"))
    if detection in ("appearance", "both"):
        det = functools.partial(
            detect_loop_closures_descriptor,
            max_candidates=max_candidates,
            min_separation=min_separation,
            max_descriptor_dist=max_descriptor_dist,
        )
        cand_sets.append((jax.vmap(det)(descriptors), appearance_init))

    # flatten the batch into the keyframe axis: item b's frame t lives at
    # flat index b*L + t, so per-item candidate pairs offset by b*L
    poses_flat = poses.reshape(B * L, 4, 4)
    pts_flat = frame_points.reshape(B * L, N, 3)
    nrm_flat = frame_normals.reshape(B * L, N, 3)
    val_flat = frame_valid.reshape(B * L, N)
    offs = (jnp.arange(B, dtype=jnp.int32) * L)[:, None, None]

    Z_parts, w_parts, edge_parts, valid_parts = [], [], [], []
    for cand_b, init in cand_sets:
        K = cand_b.edges.shape[1]
        flat = LoopCandidates(
            edges=(cand_b.edges + offs).reshape(B * K, 2),
            valid=cand_b.valid.reshape(B * K),
        )
        Z_f, w_f = verify_loop_closures(
            flat,
            poses_flat,
            pts_flat,
            nrm_flat,
            val_flat,
            numiters=icp_numiters,
            inlier_dist=inlier_dist,
            min_inlier_frac=min_inlier_frac,
            init=init,
        )
        Z_parts.append(Z_f.reshape(B, K, 4, 4))
        w_parts.append(w_f.reshape(B, K))
        edge_parts.append(cand_b.edges)
        valid_parts.append(cand_b.valid)

    cand = LoopCandidates(
        edges=jnp.concatenate(edge_parts, axis=1),
        valid=jnp.concatenate(valid_parts, axis=1),
    )
    Z_loop = jnp.concatenate(Z_parts, axis=1)  # (B, K', 4, 4)
    w_loop = jnp.concatenate(w_parts, axis=1)  # (B, K')

    if len(cand_sets) > 1:
        # per-item dedup across detectors (same masking rule as
        # close_loops, vectorized over B)
        key = cand.edges[..., 0] * L + cand.edges[..., 1]  # (B, K')
        live = w_loop > 0
        Kp = key.shape[1]
        tri = (
            jnp.arange(Kp)[:, None] > jnp.arange(Kp)[None, :]
        )  # (K', K')
        dup = (
            (key[:, :, None] == key[:, None, :])
            & live[:, :, None]
            & live[:, None, :]
            & tri[None]
        ).any(axis=2)
        w_loop = jnp.where(dup, 0.0, w_loop)

    edges_odo = jnp.stack(
        [jnp.arange(L - 1), jnp.arange(1, L)], axis=-1
    ).astype(jnp.int32)
    Z_odo = relative_transformation(
        poses[:, :-1], poses[:, 1:], orthogonal_rotations=True
    )  # (B, L-1, 4, 4)

    graphs = PoseGraph(
        poses=poses,
        edges=jnp.concatenate(
            [jnp.broadcast_to(edges_odo[None], (B, L - 1, 2)), cand.edges],
            axis=1,
        ),
        measurements=jnp.concatenate([Z_odo, Z_loop], axis=1),
        weights=jnp.concatenate(
            [
                jnp.full((B, L - 1), odometry_weight, poses.dtype),
                w_loop * loop_weight,
            ],
            axis=1,
        ),
    )
    refined = jax.vmap(
        lambda g: pose_graph_refine(g, num_iters=refine_iters)
    )(graphs)
    return refined, cand, w_loop


def frame_clouds_from_rgbd(
    depth_seq: jnp.ndarray, intrinsics: jnp.ndarray, dsratio: int = 4
):
    """Per-keyframe camera-frame clouds from an RGB-D sequence.

    Returns (pts (B, L, S, 3), nrm (B, L, S, 3), val (B, L, S),
    normal_map (B, L, H, W, 3), valid (B, L, H, W, 1)) — the strided
    vertex/normal-map subsamples used by loop-closure detection and
    verification, plus the full-resolution maps for grid descriptors.
    """
    from ..structures.rgbdimages import (
        compute_normal_map,
        compute_vertex_map,
        valid_depth_mask,
    )

    B, L = depth_seq.shape[:2]
    vm = compute_vertex_map(depth_seq, intrinsics)  # (B, L, H, W, 3)
    valid = valid_depth_mask(depth_seq)
    nm = compute_normal_map(vm, valid)
    sl = (slice(None), slice(None), slice(None, None, dsratio),
          slice(None, None, dsratio))
    pts = vm[sl].reshape(B, L, -1, 3)
    nrm = nm[sl].reshape(B, L, -1, 3)
    val = valid[sl].reshape(B, L, -1)
    return pts, nrm, val, nm, valid


def close_loops_rgbd(
    rgb_seq: jnp.ndarray,
    depth_seq: jnp.ndarray,
    intrinsics: jnp.ndarray,
    poses: jnp.ndarray,
    dsratio: int = 4,
    descriptor: str = "invariant",
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
        descriptor: for appearance detection — ``'invariant'``
            (:func:`keyframe_descriptors_invariant`, viewpoint-robust,
            default) or ``'grid'`` (:func:`keyframe_descriptors`,
            same-viewpoint revisits only).
        **kwargs: forwarded to :func:`close_loops` (detection thresholds,
            ICP iterations, weights).

    Returns:
        (B, L, 4, 4) refined trajectory.
    """
    if descriptor not in ("invariant", "grid"):
        raise ValueError(
            f"descriptor must be 'invariant' or 'grid', got {descriptor!r}"
        )
    pts, nrm, val, nm, valid = frame_clouds_from_rgbd(
        depth_seq, intrinsics, dsratio
    )
    # pose-independent appearance descriptors for drift-robust detection
    descs = None
    if kwargs.get("detection", "pose") in ("appearance", "both"):
        if descriptor == "invariant":
            descs = jax.vmap(keyframe_descriptors_invariant)(pts, nrm, val)
        else:
            descs = jax.vmap(keyframe_descriptors)(
                depth_seq[..., 0], nm, valid[..., 0]
            )

    # one batched program per stage — detection vmapped, all B*K
    # candidates ICP-verified in one solve, refinement vmapped
    refined, _, _ = close_loops_batched(
        poses, pts, nrm, val,
        **({} if descs is None else {"descriptors": descs}),
        **kwargs,
    )
    return refined
