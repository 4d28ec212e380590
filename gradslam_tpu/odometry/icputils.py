"""Differentiable point-to-plane ICP solvers (TPU-native).

Parity surface with the reference's icputils
(reference: gradslam/odometry/icputils.py) re-designed for XLA:

  - Everything is batched over B from the start — the reference's Python
    loop over batch items (odometry/gradicp.py:105) dissolves into batched
    array ops.
  - The iteration loop is a ``lax.fori_loop``; classic LM's accept/reject
    becomes a ``where``-gate, gradLM was already smooth (by design — see
    the gradSLAM paper's gradLM section).
  - Data-dependent row filtering (reference icputils.py:203-208) becomes a
    weight mask: filtered rows contribute zero to the normal equations and
    the residual error — algebraically identical for binary weights.
  - Data association is the Pallas 1-NN kernel (ops/knn.py), replacing the
    chamferdist CUDA extension (reference icputils.py:200).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from ..geometry import se3_exp, transform_pointcloud
from ..ops.knn import KnnTargets, knn, prepare_targets

__all__ = [
    "solve_linear_system",
    "gauss_newton_solve",
    "gauss_newton_solve_projective",
    "huber_weights",
    "point_to_plane_ICP",
    "point_to_plane_gradICP",
    "point_to_plane_ICP_projective",
    "point_to_plane_gradICP_projective",
    "downsample_pointclouds",
    "downsample_rgbdimages",
    "frame_points_from_maps",
]

_HIGH = jax.lax.Precision.HIGHEST


class FramePoints(NamedTuple):
    """A fixed-size masked point set (the jit-safe 'pointcloud')."""

    points: jnp.ndarray  # (B, N, 3)
    normals: jnp.ndarray  # (B, N, 3)
    colors: jnp.ndarray  # (B, N, 3)
    valid: jnp.ndarray  # (B, N) bool


def solve_linear_system(
    A: jnp.ndarray,
    b: jnp.ndarray,
    damp: Union[float, jnp.ndarray] = 1e-8,
    weights: Optional[jnp.ndarray] = None,
):
    """Solves the damped normal equations ``(A^T W A + damp I) x = A^T W b``.

    Reference parity: gradslam/odometry/icputils.py:22-90, except the 6x6
    system is solved with ``jnp.linalg.solve`` (Cholesky-backed) rather than
    an explicit inverse, and row filtering is expressed as binary weights.
    Differentiable w.r.t. A, b and damp.

    Args:
        A: (..., N, D) constraint matrix.
        b: (..., N, 1) residual vector.
        damp: scalar or (...,) damping added to the diagonal.
        weights: optional (..., N) row weights (0 = filtered row).

    Returns:
        (..., D, 1) solution.
    """
    if weights is not None:
        Aw = A * weights[..., None]
    else:
        Aw = A
    AtA = jnp.einsum("...nd,...ne->...de", Aw, A, precision=_HIGH)
    Atb = jnp.einsum("...nd,...no->...do", Aw, b, precision=_HIGH)
    damp = jnp.asarray(damp, dtype=A.dtype)
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)
    AtA = AtA + eye * damp[..., None, None] if damp.ndim else AtA + eye * damp
    return jnp.linalg.solve(AtA, Atb)


def huber_weights(residuals: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weights for the Huber robust loss: ``min(1, delta / |r|)``.

    Net-new robustness option (beyond the reference's plain least squares):
    down-weights association outliers so single bad correspondences cannot
    dominate the 6x6 normal equations. Differentiable everywhere except
    |r| = delta (subgradient), which is fine for gradLM.
    """
    abs_r = jnp.abs(residuals)
    return jnp.minimum(1.0, delta / jnp.maximum(abs_r, 1e-12))


def gauss_newton_solve(
    src_pc: jnp.ndarray,
    tgt_pc: jnp.ndarray,
    tgt_normals: jnp.ndarray,
    dist_thresh: Optional[float] = None,
    src_valid: Optional[jnp.ndarray] = None,
    tgt_valid: Optional[jnp.ndarray] = None,
    robust_delta: Optional[float] = None,
    prepared_tgt: Optional[KnnTargets] = None,
    tgt_packed: Optional[jnp.ndarray] = None,
):
    """One Gauss-Newton linearization of point-to-plane ICP (batched).

    KNN-associates each source point to its closest target, then builds the
    linear system rows ``A = [nx, ny, nz, nz*sy - ny*sz, nx*sz - nz*sx,
    ny*sx - nx*sy]`` and ``b = n . (d - s)`` (reference icputils.py:227-230).
    The reference's distance filter (squared-distance threshold,
    icputils.py:203-208) returns here as a weight mask instead of removing
    rows.

    Args:
        src_pc: (B, S, 3) source points.
        tgt_pc: (B, T, 3) target points.
        tgt_normals: (B, T, 3) target normals.
        dist_thresh: optional squared-distance gate.
        src_valid: optional (B, S) source validity.
        tgt_valid: optional (B, T) target validity.
        robust_delta: optional Huber threshold on the point-to-plane
            residual; scales row weights by ``min(1, delta/|b|)``.
        prepared_tgt: optional pre-processed targets (ops/knn.py
            ``prepare_targets``) — hoists the loop-invariant target-side
            KNN work out of solver loops.
        tgt_packed: optional (B, T, 6) ``concat([tgt_pc, tgt_normals])``
            rows — ONE wide association gather instead of two 3-channel
            ones (row-gather cost is dominated by per-row issue cost, so
            wide rows are nearly free; CLAUDE.md perf notes). Build it
            once outside solver loops.

    Returns:
        (A, b, weights, chamfer_idx): (B, S, 6), (B, S, 1), (B, S) float
        weights (binary gates times optional Huber factors), and (B, S)
        int32 association indices.
    """
    dists, idx = knn(
        src_pc, prepared_tgt if prepared_tgt is not None else tgt_pc, tgt_valid
    )

    w = jnp.ones(dists.shape, dtype=src_pc.dtype)
    if dist_thresh is not None:
        w = w * (dists < dist_thresh)
    if src_valid is not None:
        w = w * src_valid
    # a fully-invalid target set yields inf dists; mask those too
    w = w * jnp.isfinite(dists)

    if tgt_packed is not None:
        rows = jnp.take_along_axis(tgt_packed, idx[..., None], axis=1)
        assoc_pts, assoc_n = rows[..., 0:3], rows[..., 3:6]
    else:
        take = lambda x: jnp.take_along_axis(x, idx[..., None], axis=1)
        assoc_pts = take(tgt_pc)  # (B, S, 3) — differentiable gather
        assoc_n = take(tgt_normals)

    A, b, w = _point_to_plane_rows(src_pc, assoc_pts, assoc_n, w, robust_delta)
    return A, b, w, idx


def _point_to_plane_rows(src_pc, assoc_pts, assoc_n, w, robust_delta=None):
    """Point-to-plane linear-system rows from associated pairs.

    ``A = [nx, ny, nz, nz*sy - ny*sz, nx*sz - nz*sx, ny*sx - nx*sy]`` and
    ``b = n . (d - s)`` (reference icputils.py:227-230), with optional
    Huber down-weighting of the residuals.
    """
    s = src_pc
    nx, ny, nz = assoc_n[..., 0], assoc_n[..., 1], assoc_n[..., 2]
    sx, sy, sz = s[..., 0], s[..., 1], s[..., 2]
    A = jnp.stack(
        [
            nx,
            ny,
            nz,
            nz * sy - ny * sz,
            nx * sz - nz * sx,
            ny * sx - nx * sy,
        ],
        axis=-1,
    )
    b = jnp.sum(assoc_n * (assoc_pts - s), axis=-1, keepdims=True)
    if robust_delta is not None:
        w = w * huber_weights(b[..., 0], robust_delta)
    return A, b, w


def gauss_newton_solve_projective(
    src_pc: jnp.ndarray,
    tgt_img: jnp.ndarray,
    view_pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    H: int,
    W: int,
    dist_thresh: Optional[float] = None,
    src_valid: Optional[jnp.ndarray] = None,
    robust_delta: Optional[float] = None,
):
    """One Gauss-Newton linearization with PROJECTIVE data association.

    TPU-first alternative to the KNN association in
    :func:`gauss_newton_solve` (net-new vs the reference, which always
    uses chamferdist KNN): each source point is associated with the model
    point stored at its projected pixel in the ``view_pose`` camera — the
    classic projective ICP of KinectFusion/point-based fusion systems.
    Cost is O(S) per linearization (one projection + one wide row gather)
    instead of O(S*T), which is what makes large-map odometry cheap on
    TPU; the trade is that association quality depends on the camera
    motion being small enough that projecting into the previous view
    finds the right surface (the standard projective-ICP assumption).

    Args:
        src_pc: (B, S, 3) source points (world frame).
        tgt_img: (B, H*W, 7) per-pixel model rows
            ``[x, y, z, nx, ny, nz, valid]`` in world frame (the model
            image; see slam/fusionutils.fusion_update_compact).
        view_pose: (B, 4, 4) camera-to-world pose the model image was
            rendered at (the previous frame's pose).
        intrinsics: (B, 4, 4) or (B, 1, 4, 4).
        dist_thresh / src_valid / robust_delta: as in
            :func:`gauss_newton_solve`.

    Returns:
        (A, b, weights, pix): (B, S, 6), (B, S, 1), (B, S) weights and the
        (B, S) int32 associated pixel index.
    """
    from ..geometry import project_points_to_pixels

    B_, S = src_pc.shape[0], src_pc.shape[1]
    live = jnp.ones((B_, S), dtype=bool)
    h, w_, inb = project_points_to_pixels(
        jax.lax.stop_gradient(src_pc), live, view_pose, intrinsics, H, W
    )
    pix = h * W + w_  # (B, S) — non-differentiable association indices
    rows = jnp.take_along_axis(tgt_img, pix[..., None], axis=1)  # (B, S, 7)
    assoc_pts, assoc_n = rows[..., 0:3], rows[..., 3:6]

    w = inb.astype(src_pc.dtype) * rows[..., 6]
    if dist_thresh is not None:
        dists = jnp.sum((assoc_pts - src_pc) ** 2, axis=-1)
        w = w * (dists < dist_thresh)
    if src_valid is not None:
        w = w * src_valid

    A, b, w = _point_to_plane_rows(src_pc, assoc_pts, assoc_n, w, robust_delta)
    return A, b, w, pix


def _icp_common_step(solve_fn, src_pc, damp):
    """Shared per-iteration work: linearize, solve, lookahead error.

    ``solve_fn(src) -> (A, b, w, idx)`` is the data-association +
    linearization callback — KNN (:func:`gauss_newton_solve`) or
    projective (:func:`gauss_newton_solve_projective`).
    """
    A, b, w, _ = solve_fn(src_pc)
    xi = solve_linear_system(A, b, damp, weights=w)[..., 0]  # (B, 6)
    residual_transform = se3_exp(xi)
    err = jnp.sum(w * b[..., 0] ** 2, axis=-1)  # (B,)

    one_step_pc = transform_pointcloud(src_pc, residual_transform)
    _, b1, w1, _ = solve_fn(one_step_pc)
    new_err = jnp.sum(w1 * b1[..., 0] ** 2, axis=-1)
    return xi, residual_transform, one_step_pc, err, new_err


def _icp_loop(solve_fn, src_pc, initial_transform, numiters, damp):
    """Classic LM loop: where-gated accept/reject (reference :326-366).

    ONE data association per iteration instead of the reference's two:
    the lookahead linearization at the stepped cloud IS the next
    iteration's linearization when the step is accepted, and the current
    one is when it is rejected — so the loop carries (A, b, w) and only
    linearizes the lookahead point. Same values in the same order as the
    two-association form (the association is deterministic in the cloud),
    at half the per-iteration association cost.
    """
    B = src_pc.shape[0]
    dtype = src_pc.dtype
    if initial_transform is None:
        initial_transform = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (B, 4, 4))
    src0 = transform_pointcloud(src_pc, initial_transform)
    A0, b0, w0, _ = solve_fn(src0)

    def body(_, state):
        src, transform, damp_v, A, b, w = state
        xi = solve_linear_system(A, b, damp_v, weights=w)[..., 0]  # (B, 6)
        rt = se3_exp(xi)
        err = jnp.sum(w * b[..., 0] ** 2, axis=-1)  # (B,)
        one_step = transform_pointcloud(src, rt)
        A1, b1, w1, _ = solve_fn(one_step)
        new_err = jnp.sum(w1 * b1[..., 0] ** 2, axis=-1)
        accept = (new_err < err)[:, None]  # (B, 1)
        src = jnp.where(accept[..., None], one_step, src)
        A = jnp.where(accept[..., None], A1, A)
        b = jnp.where(accept[..., None], b1, b)
        w = jnp.where(accept, w1, w)
        damp_v = jnp.where(accept[:, 0], damp_v / 2.0, damp_v * 2.0)
        new_transform = jnp.matmul(rt, transform)
        transform = jnp.where(accept[..., None], new_transform, transform)
        return src, transform, damp_v, A, b, w

    damp0 = jnp.full((B,), damp, dtype=dtype)
    state = jax.lax.fori_loop(
        0, numiters, body, (src0, initial_transform, damp0, A0, b0, w0)
    )
    return state[1]


def _gradicp_loop(
    solve_fn, src_pc, initial_transform, numiters, damp,
    lambda_max, B, B2, nu,
):
    """GradLM loop: smooth damping/step gates (reference :496-545)."""
    nbatch = src_pc.shape[0]
    dtype = src_pc.dtype
    lambda_min = 1.0 / lambda_max
    if initial_transform is None:
        initial_transform = jnp.broadcast_to(
            jnp.eye(4, dtype=dtype), (nbatch, 4, 4)
        )
    src0 = transform_pointcloud(src_pc, initial_transform)

    def body(_, state):
        src, transform, damp_v = state
        xi, _, _, err, new_err = _icp_common_step(solve_fn, src, damp_v)
        errdiff = jnp.clip(new_err - err, -70.0, 70.0)  # (nbatch,)
        damp_new = lambda_min + (lambda_max - lambda_min) / (
            1.0 + jnp.exp(-B * errdiff)
        )
        damp_v = damp_v * damp_new
        sigmoid = 1.0 / (1.0 + jnp.exp(-B2 * errdiff)) ** (1.0 / nu)
        rt = se3_exp(sigmoid[:, None] * xi)
        src = transform_pointcloud(src, rt)
        transform = jnp.matmul(rt, transform)
        return src, transform, damp_v

    damp0 = jnp.full((nbatch,), damp, dtype=dtype)
    _, transform, _ = jax.lax.fori_loop(
        0, numiters, body, (src0, initial_transform, damp0)
    )
    return transform


def point_to_plane_ICP(
    src_pc: jnp.ndarray,
    tgt_pc: jnp.ndarray,
    tgt_normals: jnp.ndarray,
    initial_transform: Optional[jnp.ndarray] = None,
    numiters: int = 20,
    damp: float = 1e-8,
    dist_thresh: Optional[float] = None,
    src_valid: Optional[jnp.ndarray] = None,
    tgt_valid: Optional[jnp.ndarray] = None,
    robust_delta: Optional[float] = None,
):
    """Classic point-to-plane ICP with an LM trust region (batched).

    Per iteration: Gauss-Newton solve, lookahead error on the transformed
    cloud; accept (halve damping, apply step) when the lookahead error
    improves, else reject (double damping) — the reference's Python
    if/else (icputils.py:326-366) expressed as ``where`` gates inside a
    ``fori_loop``.

    Args:
        src_pc: (B, S, 3); tgt_pc/(tgt_normals): (B, T, 3).
        initial_transform: optional (B, 4, 4).

    Returns:
        (B, 4, 4) transforms aligning src to tgt.
    """
    prepared = prepare_targets(tgt_pc, tgt_valid)  # loop-invariant
    packed = jnp.concatenate([tgt_pc, tgt_normals], axis=-1)
    solve_fn = lambda src: gauss_newton_solve(
        src, tgt_pc, tgt_normals, dist_thresh, src_valid, tgt_valid,
        robust_delta, prepared, packed,
    )
    return _icp_loop(solve_fn, src_pc, initial_transform, numiters, damp)


def point_to_plane_gradICP(
    src_pc: jnp.ndarray,
    tgt_pc: jnp.ndarray,
    tgt_normals: jnp.ndarray,
    initial_transform: Optional[jnp.ndarray] = None,
    numiters: int = 20,
    damp: float = 1e-8,
    dist_thresh: Optional[float] = None,
    lambda_max: float = 2.0,
    B: float = 1.0,
    B2: float = 1.0,
    nu: float = 200.0,
    src_valid: Optional[jnp.ndarray] = None,
    tgt_valid: Optional[jnp.ndarray] = None,
    robust_delta: Optional[float] = None,
):
    """GradLM point-to-plane ICP — the gradSLAM paper's smooth LM (batched).

    Per iteration (reference icputils.py:496-545):
      ``errdiff = clamp(new_err - err, -70, 70)``
      ``damp *= lambda_min + (lambda_max - lambda_min) / (1 + exp(-B errdiff))``
      ``sigmoid = (1 + exp(-B2 errdiff)) ** (-1/nu)``
      apply ``se3_exp(sigmoid * xi)`` — always steps; fully differentiable.

    Returns:
        (B, 4, 4) transforms aligning src to tgt.
    """
    prepared = prepare_targets(tgt_pc, tgt_valid)  # loop-invariant
    packed = jnp.concatenate([tgt_pc, tgt_normals], axis=-1)
    solve_fn = lambda src: gauss_newton_solve(
        src, tgt_pc, tgt_normals, dist_thresh, src_valid, tgt_valid,
        robust_delta, prepared, packed,
    )
    return _gradicp_loop(
        solve_fn, src_pc, initial_transform, numiters, damp,
        lambda_max, B, B2, nu,
    )


def point_to_plane_ICP_projective(
    src_pc: jnp.ndarray,
    tgt_img: jnp.ndarray,
    view_pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    H: int,
    W: int,
    initial_transform: Optional[jnp.ndarray] = None,
    numiters: int = 20,
    damp: float = 1e-8,
    dist_thresh: Optional[float] = None,
    src_valid: Optional[jnp.ndarray] = None,
    robust_delta: Optional[float] = None,
):
    """Classic point-to-plane ICP with PROJECTIVE association.

    Same LM loop as :func:`point_to_plane_ICP`, but each iteration
    associates source points by projecting them into the ``view_pose``
    camera and reading the model image — O(S) per iteration instead of
    O(S*T) (see :func:`gauss_newton_solve_projective`).
    """
    solve_fn = lambda src: gauss_newton_solve_projective(
        src, tgt_img, view_pose, intrinsics, H, W,
        dist_thresh, src_valid, robust_delta,
    )
    return _icp_loop(solve_fn, src_pc, initial_transform, numiters, damp)


def point_to_plane_gradICP_projective(
    src_pc: jnp.ndarray,
    tgt_img: jnp.ndarray,
    view_pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    H: int,
    W: int,
    initial_transform: Optional[jnp.ndarray] = None,
    numiters: int = 20,
    damp: float = 1e-8,
    dist_thresh: Optional[float] = None,
    lambda_max: float = 2.0,
    B: float = 1.0,
    B2: float = 1.0,
    nu: float = 200.0,
    src_valid: Optional[jnp.ndarray] = None,
    robust_delta: Optional[float] = None,
):
    """GradLM point-to-plane ICP with PROJECTIVE association.

    Same smooth LM loop as :func:`point_to_plane_gradICP` with the O(S)
    projective association of :func:`gauss_newton_solve_projective`.
    """
    solve_fn = lambda src: gauss_newton_solve_projective(
        src, tgt_img, view_pose, intrinsics, H, W,
        dist_thresh, src_valid, robust_delta,
    )
    return _gradicp_loop(
        solve_fn, src_pc, initial_transform, numiters, damp,
        lambda_max, B, B2, nu,
    )


# ---------------------------------------------------------------------------
# Downsampling helpers
# ---------------------------------------------------------------------------


def frame_points_from_maps(
    global_vertex_map: jnp.ndarray,
    global_normal_map: jnp.ndarray,
    rgb_image: jnp.ndarray,
    valid_mask: jnp.ndarray,
    ds_ratio: int,
) -> FramePoints:
    """Strided ``[::ds, ::ds]`` subsampling of frame maps into a fixed-size
    masked point set (jit path of the reference's ``downsample_rgbdimages``,
    icputils.py:623-669).

    Args:
        global_vertex_map / global_normal_map / rgb_image: (B, 1, H, W, 3).
        valid_mask: (B, 1, H, W, 1).
    """
    B = global_vertex_map.shape[0]
    sl = (slice(None), 0, slice(None, None, ds_ratio), slice(None, None, ds_ratio))
    pts = global_vertex_map[sl].reshape(B, -1, 3)
    nrm = global_normal_map[sl].reshape(B, -1, 3)
    col = rgb_image[sl].reshape(B, -1, 3)
    val = valid_mask[sl].reshape(B, -1)
    return FramePoints(points=pts, normals=nrm, colors=col, valid=val)


def downsample_rgbdimages(rgbdimages, ds_ratio: int):
    """Downsamples an RGBDImages batch (seq len 1) into ragged Pointclouds.

    API-parity wrapper (reference icputils.py:623): the jit path uses
    :func:`frame_points_from_maps` directly.
    """
    from ..structures import Pointclouds

    if rgbdimages.shape[1] != 1:
        raise ValueError(
            f"expected sequence length 1, got {rgbdimages.shape[1]}"
        )
    rgbd = rgbdimages.to_channels_last()
    fp = frame_points_from_maps(
        rgbd.global_vertex_map,
        rgbd.global_normal_map,
        rgbd.rgb_image,
        rgbd.valid_depth_mask,
        ds_ratio,
    )
    # compact valid entries to the front (host-boundary ragged form)
    order = jnp.argsort(~fp.valid, axis=1, stable=True)
    take = lambda x: jnp.take_along_axis(x, order[..., None], axis=1)
    counts = jnp.sum(fp.valid, axis=1).astype(jnp.int32)
    mask = (
        jnp.arange(fp.points.shape[1], dtype=jnp.int32)[None, :]
        < counts[:, None]
    )[..., None].astype(fp.points.dtype)
    return Pointclouds(
        points=take(fp.points) * mask,
        normals=take(fp.normals) * mask,
        colors=take(fp.colors) * mask,
        num_points=counts,
    )


def downsample_pointclouds(pointclouds, pc2im_bnhw, ds_ratio: int):
    """Downsamples active map points by pixel-stride gating.

    Keeps points whose projected (h, w) are both multiples of ``ds_ratio``
    (reference icputils.py:548-620). ``pc2im_bnhw`` is the (num_active, 4)
    active-points lookup table from ``find_active_map_points``.
    """
    from ..structures import Pointclouds
    import numpy as np

    pc2im = np.asarray(pc2im_bnhw)
    keep = (pc2im[:, 2] % ds_ratio == 0) & (pc2im[:, 3] % ds_ratio == 0)
    pc2im = pc2im[keep]
    B = len(pointclouds)
    pts_l, nrm_l, col_l = [], [], []
    pl_list = pointclouds.points_list
    nl_list = pointclouds.normals_list
    cl_list = pointclouds.colors_list
    for b in range(B):
        rows = pc2im[pc2im[:, 0] == b][:, 1]
        pts_l.append(np.asarray(pl_list[b])[rows])
        if nl_list is not None:
            nrm_l.append(np.asarray(nl_list[b])[rows])
        if cl_list is not None:
            col_l.append(np.asarray(cl_list[b])[rows])
    return Pointclouds(
        points=pts_l,
        normals=nrm_l if nl_list is not None else None,
        colors=col_l if cl_list is not None else None,
    )
