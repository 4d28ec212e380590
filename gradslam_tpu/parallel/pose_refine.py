"""Distributed pose refinement: pose-graph Gauss-Newton and
Schur-complement bundle adjustment.

Net-new scope (the reference processes frames strictly serially and has no
global refinement — SURVEY.md §2.9). This is the sequence/context-parallel
analogue for SLAM: keyframes and observations partition across devices,
each shard linearizes its residuals locally, per-shard Hessian blocks are
``psum``-reduced over the mesh, and the small reduced system is solved
replicated.

Components:
  - :func:`pose_graph_refine` — Gauss-Newton over SE(3) keyframe poses
    with relative-pose (odometry / loop-closure) edge constraints.
    Jacobians come from forward-mode autodiff of the residual w.r.t. left
    perturbations (exact, no hand-derived adjoints to get wrong).
  - :func:`pose_graph_refine_sharded` — same, edges sharded over a mesh
    axis via ``shard_map`` + ``psum`` (correctness oracle: the
    single-device solution of the same system).
  - :func:`ba_refine` — point-landmark bundle adjustment with the
    landmark block eliminated by a Schur complement (H_ll is 3x3
    block-diagonal), solving only the reduced 6L x 6L camera system.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry import inverse_transformation, se3_exp, se3_log

__all__ = [
    "PoseGraph",
    "pose_graph_residuals",
    "pose_graph_refine",
    "pose_graph_refine_sharded",
    "ba_refine",
]

_HIGH = jax.lax.Precision.HIGHEST


class PoseGraph(NamedTuple):
    """A pose graph: L keyframe poses and E relative-pose constraints.

    Attributes:
        poses: (L, 4, 4) world-from-keyframe transforms.
        edges: (E, 2) int32 (i, j) index pairs.
        measurements: (E, 4, 4) measured relative transforms
            ``Z_ij ~ T_i^-1 T_j``.
        weights: (E,) per-edge information weights (0 disables an edge —
            used for static-shape padding when sharding).
    """

    poses: jnp.ndarray
    edges: jnp.ndarray
    measurements: jnp.ndarray
    weights: jnp.ndarray


def _edge_residual(T_i, T_j, Z_ij):
    """se3 log of the relative-pose discrepancy (6,)."""
    pred = jnp.matmul(inverse_transformation(T_i), T_j)
    return se3_log(jnp.matmul(inverse_transformation(Z_ij), pred))


def pose_graph_residuals(graph: PoseGraph) -> jnp.ndarray:
    """(E, 6) stacked edge residuals."""
    T_i = graph.poses[graph.edges[:, 0]]
    T_j = graph.poses[graph.edges[:, 1]]
    return jax.vmap(_edge_residual)(T_i, T_j, graph.measurements)


def _linearize_edges(poses, edges, measurements, weights):
    """Per-edge residuals + Jacobians w.r.t. left perturbations.

    Returns (r (E, 6), J_i (E, 6, 6), J_j (E, 6, 6)) with weights applied
    (weight w scales r and J by sqrt(w) so JtJ/Jtr see w).
    """
    T_i = poses[edges[:, 0]]
    T_j = poses[edges[:, 1]]

    def residual_of_perturbation(xi_i, xi_j, Ti, Tj, Z):
        return _edge_residual(
            jnp.matmul(se3_exp(xi_i), Ti), jnp.matmul(se3_exp(xi_j), Tj), Z
        )

    zeros = jnp.zeros(6, dtype=poses.dtype)

    def per_edge(Ti, Tj, Z, w):
        r = residual_of_perturbation(zeros, zeros, Ti, Tj, Z)
        J_i = jax.jacfwd(residual_of_perturbation, argnums=0)(
            zeros, zeros, Ti, Tj, Z
        )
        J_j = jax.jacfwd(residual_of_perturbation, argnums=1)(
            zeros, zeros, Ti, Tj, Z
        )
        sw = jnp.sqrt(w)
        return r * sw, J_i * sw, J_j * sw

    return jax.vmap(per_edge)(T_i, T_j, measurements, weights)


def _assemble_normal_equations(L, edges, r, J_i, J_j):
    """Scatter-adds per-edge blocks into H (L, 6, L, 6) and b (L, 6)."""
    i = edges[:, 0]
    j = edges[:, 1]
    H = jnp.zeros((L, 6, L, 6), dtype=r.dtype)
    b = jnp.zeros((L, 6), dtype=r.dtype)

    # (E, 6, 6) blocks
    JiTJi = jnp.einsum("eab,eac->ebc", J_i, J_i, precision=_HIGH)
    JjTJj = jnp.einsum("eab,eac->ebc", J_j, J_j, precision=_HIGH)
    JiTJj = jnp.einsum("eab,eac->ebc", J_i, J_j, precision=_HIGH)
    JiTr = jnp.einsum("eab,ea->eb", J_i, r, precision=_HIGH)
    JjTr = jnp.einsum("eab,ea->eb", J_j, r, precision=_HIGH)

    H = H.at[i, :, i, :].add(JiTJi)
    H = H.at[j, :, j, :].add(JjTJj)
    H = H.at[i, :, j, :].add(JiTJj)
    H = H.at[j, :, i, :].add(jnp.swapaxes(JiTJj, -1, -2))
    b = b.at[i].add(JiTr)
    b = b.at[j].add(JjTr)
    return H, b


def _solve_and_update(poses, H, b, damping, anchor_weight):
    L = poses.shape[0]
    # gauge fix: strong prior pinning pose 0
    H = H.at[0, :, 0, :].add(jnp.eye(6, dtype=poses.dtype) * anchor_weight)
    Hm = H.reshape(L * 6, L * 6)
    Hm = Hm + jnp.eye(L * 6, dtype=poses.dtype) * damping
    delta = jnp.linalg.solve(Hm, -b.reshape(L * 6)).reshape(L, 6)
    return jnp.matmul(se3_exp(delta), poses)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def pose_graph_refine(
    graph: PoseGraph,
    num_iters: int = 10,
    damping: float = 1e-6,
    anchor_weight: float = 1e6,
) -> jnp.ndarray:
    """Gauss-Newton pose-graph optimization (single device).

    Returns refined (L, 4, 4) poses; pose 0 is gauge-anchored.
    """
    L = graph.poses.shape[0]

    def body(_, poses):
        r, J_i, J_j = _linearize_edges(
            poses, graph.edges, graph.measurements, graph.weights
        )
        H, b = _assemble_normal_equations(L, graph.edges, r, J_i, J_j)
        return _solve_and_update(poses, H, b, damping, anchor_weight)

    return jax.lax.fori_loop(0, num_iters, body, graph.poses)


def pose_graph_refine_sharded(
    graph: PoseGraph,
    mesh: Mesh,
    axis: str = "data",
    num_iters: int = 10,
    damping: float = 1e-6,
    anchor_weight: float = 1e6,
) -> jnp.ndarray:
    """Distributed pose-graph refinement: edges sharded over ``axis``.

    Each shard linearizes its edge subset and assembles local normal
    equations; ``psum`` over the mesh reduces the (L, 6, L, 6) Hessian and
    (L, 6) gradient; every shard solves the (small) reduced system
    replicated. Edges are zero-weight-padded to a multiple of the axis
    size (static shapes).
    """
    from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]
    E = graph.edges.shape[0]
    pad = (-E) % n
    edges = jnp.pad(graph.edges, ((0, pad), (0, 0)))
    meas = jnp.pad(
        graph.measurements,
        ((0, pad), (0, 0), (0, 0)),
        constant_values=0.0,
    )
    # padded edges get identity measurement and weight 0
    if pad:
        eye = jnp.broadcast_to(
            jnp.eye(4, dtype=meas.dtype), (pad, 4, 4)
        )
        meas = meas.at[E:].set(eye)
    weights = jnp.pad(graph.weights, (0, pad))

    L = graph.poses.shape[0]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=P(),
    )
    def refine(poses, edges_s, meas_s, w_s):
        def body(_, poses):
            r, J_i, J_j = _linearize_edges(poses, edges_s, meas_s, w_s)
            H, b = _assemble_normal_equations(L, edges_s, r, J_i, J_j)
            H = jax.lax.psum(H, axis)
            b = jax.lax.psum(b, axis)
            return _solve_and_update(poses, H, b, damping, anchor_weight)

        return jax.lax.fori_loop(0, num_iters, body, poses)

    return jax.jit(refine)(graph.poses, edges, meas, weights)


# ---------------------------------------------------------------------------
# Schur-complement bundle adjustment
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_iters",))
def ba_refine(
    poses: jnp.ndarray,
    landmarks: jnp.ndarray,
    obs_pose: jnp.ndarray,
    obs_lm: jnp.ndarray,
    obs_pts: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    num_iters: int = 5,
    damping: float = 1e-4,
    anchor_weight: float = 1e6,
):
    """Point-landmark bundle adjustment with Schur-complement elimination.

    Observation model: landmark ``l`` seen from pose ``p`` at camera-frame
    position ``obs_pts``; residual ``r = T_p^-1 X_l - obs``. The landmark
    block H_ll is 3x3 block-diagonal and eliminated analytically; only the
    reduced (6L, 6L) camera system is solved. This is the reduced-camera
    Schur trick that makes distributed BA tractable: per-shard
    contributions to H_cc, H_ll, W and the rhs are plain sums (psum-able).

    Args:
        poses: (L, 4, 4); landmarks: (M, 3).
        obs_pose / obs_lm: (N,) int32 indices; obs_pts: (N, 3).
        weights: optional (N,) observation weights.

    Returns:
        (refined_poses (L, 4, 4), refined_landmarks (M, 3)).
    """
    L = poses.shape[0]
    M = landmarks.shape[0]
    N = obs_pts.shape[0]
    if weights is None:
        weights = jnp.ones((N,), dtype=poses.dtype)

    def body(_, state):
        poses, landmarks = state

        T_p = poses[obs_pose]  # (N, 4, 4)
        X_l = landmarks[obs_lm]  # (N, 3)

        def obs_residual(xi, dX, T, X, z):
            Tp = jnp.matmul(se3_exp(xi), T)
            Xw = X + dX
            tinv = inverse_transformation(Tp)
            pred = jnp.matmul(tinv[:3, :3], Xw) + tinv[:3, 3]
            return pred - z

        zeros6 = jnp.zeros(6, dtype=poses.dtype)
        zeros3 = jnp.zeros(3, dtype=poses.dtype)

        def per_obs(T, X, z, w):
            r = obs_residual(zeros6, zeros3, T, X, z)
            Jp = jax.jacfwd(obs_residual, argnums=0)(zeros6, zeros3, T, X, z)
            Jl = jax.jacfwd(obs_residual, argnums=1)(zeros6, zeros3, T, X, z)
            sw = jnp.sqrt(w)
            return r * sw, Jp * sw, Jl * sw

        r, Jp, Jl = jax.vmap(per_obs)(T_p, X_l, obs_pts, weights)

        # block accumulations
        Hcc = jnp.zeros((L, 6, 6), dtype=poses.dtype)
        Hll = jnp.zeros((M, 3, 3), dtype=poses.dtype)
        bc = jnp.zeros((L, 6), dtype=poses.dtype)
        bl = jnp.zeros((M, 3), dtype=poses.dtype)

        Hcc = Hcc.at[obs_pose].add(
            jnp.einsum("nab,nac->nbc", Jp, Jp, precision=_HIGH)
        )
        Hll = Hll.at[obs_lm].add(
            jnp.einsum("nab,nac->nbc", Jl, Jl, precision=_HIGH)
        )
        bc = bc.at[obs_pose].add(
            jnp.einsum("nab,na->nb", Jp, r, precision=_HIGH)
        )
        bl = bl.at[obs_lm].add(
            jnp.einsum("nab,na->nb", Jl, r, precision=_HIGH)
        )
        W_obs = jnp.einsum("nab,nac->nbc", Jp, Jl, precision=_HIGH)  # (N,6,3)

        # invert landmark blocks (damped)
        Hll = Hll + jnp.eye(3, dtype=poses.dtype) * damping
        Hll_inv = jnp.linalg.inv(Hll)  # (M, 3, 3)

        # Schur complement S = Hcc(diag) - sum_l U_l Hll^-1 U_l^T where
        # U_l[p] = sum of W blocks of observations of landmark l from pose
        # p. Landmark-indexed accumulators make the pose-pose coupling a
        # single contraction (per-shard sums of G1/G2/Hcc/b are what gets
        # psum-reduced in the distributed setting).
        V = jnp.einsum("nab,nbc->nac", W_obs, Hll_inv[obs_lm], precision=_HIGH)
        G1 = jnp.zeros((M, L, 6, 3), dtype=poses.dtype)
        G1 = G1.at[obs_lm, obs_pose].add(V)  # W Hll^-1, grouped (lm, pose)
        G2 = jnp.zeros((M, L, 6, 3), dtype=poses.dtype)
        G2 = G2.at[obs_lm, obs_pose].add(W_obs)

        S = jnp.zeros((L, 6, L, 6), dtype=poses.dtype)
        S = S.at[jnp.arange(L), :, jnp.arange(L), :].add(Hcc)
        S = S - jnp.einsum("mpac,mqbc->paqb", G1, G2, precision=_HIGH)

        rhs = bc - jnp.einsum("mpac,mc->pa", G1, bl, precision=_HIGH)

        # gauge anchor + damping, solve reduced camera system
        S = S.at[0, :, 0, :].add(
            jnp.eye(6, dtype=poses.dtype) * anchor_weight
        )
        Sm = S.reshape(L * 6, L * 6) + jnp.eye(L * 6, dtype=poses.dtype) * damping
        delta_c = jnp.linalg.solve(Sm, -rhs.reshape(L * 6)).reshape(L, 6)

        # back-substitute landmarks:
        # delta_l = -Hll^-1 (bl + W^T delta_c) per landmark
        Wt_dc = jnp.zeros((M, 3), dtype=poses.dtype)
        Wt_dc = Wt_dc.at[obs_lm].add(
            jnp.einsum("nbc,nb->nc", W_obs, delta_c[obs_pose], precision=_HIGH)
        )
        delta_l = -jnp.einsum(
            "mab,mb->ma", Hll_inv, bl + Wt_dc, precision=_HIGH
        )

        new_poses = jnp.matmul(se3_exp(delta_c), poses)
        new_landmarks = landmarks + delta_l
        return new_poses, new_landmarks

    return jax.lax.fori_loop(0, num_iters, body, (poses, landmarks))
