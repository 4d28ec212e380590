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
    Memory is O(N_obs + L^2 + M): the pose-pose coupling is accumulated
    from observation PAIRS within each landmark's (sorted, contiguous)
    segment — never a dense (M, L, ...) cross table.
  - :func:`ba_refine_sharded` — distributed BA: observations partitioned
    over the mesh BY LANDMARK OWNERSHIP (every landmark's observations
    live on exactly one shard, so its H_ll block and Schur coupling are
    complete locally), per-shard H_cc / S / rhs contributions
    ``psum``-reduced, reduced camera system solved replicated, landmark
    back-substitution shard-local. Correctness oracle: the single-device
    :func:`ba_refine` solution of the same system.
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
    "ba_refine_sharded",
    "partition_observations_by_landmark",
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


def _ba_linearize(poses, landmarks, obs_pose, obs_lm, obs_pts, weights):
    """Per-observation residuals + Jacobians.

    Observation model: landmark ``l`` seen from pose ``p`` at camera-frame
    position ``obs_pts``; residual ``r = T_p^-1 X_l - obs``. Weight w
    scales r and J by sqrt(w) so the normal equations see w (w=0 disables
    an observation — used for static-shape padding when sharding).

    Returns (r (N, 3), Jp (N, 3, 6), Jl (N, 3, 3)).
    """
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

    return jax.vmap(per_obs)(T_p, X_l, obs_pts, weights)


_POSE_MATMUL_MAX_L = 128


def _one_hot_poses(obs_pose, L, dtype):
    """(N, L) one-hot pose encoding (fused into matmul operand loads)."""
    return (
        obs_pose[:, None] == jnp.arange(L, dtype=obs_pose.dtype)[None]
    ).astype(dtype)


def _pose_sum(vals, obs_pose, L, P=None):
    """Sums per-observation rows into per-pose bins: (N, ...) -> (L, ...).

    For L <= _POSE_MATMUL_MAX_L this is ONE one-hot MXU matmul
    (P^T @ vals) instead of a scatter-add — the scatter costs the
    ~45-75 ns/row floor per observation regardless of L, while the
    skinny matmul is bandwidth-trivial (measured on the BA bench,
    docs/PERFORMANCE.md round 4). Past the gate the (N, L) one-hot
    would not be worth materializing; the scatter path stands.
    """
    N = vals.shape[0]
    flat = vals.reshape(N, -1)
    if L <= _POSE_MATMUL_MAX_L:
        if P is None:
            P = _one_hot_poses(obs_pose, L, vals.dtype)
        out = jax.lax.dot_general(
            P, flat, (((0,), (0,)), ((), ())), precision=_HIGH
        )
    else:
        out = jnp.zeros((L, flat.shape[1]), vals.dtype).at[obs_pose].add(
            flat
        )
    return out.reshape((L,) + vals.shape[1:])


def _landmark_segments(obs_lm, M):
    """Loop-invariant prep for :func:`_landmark_sum_sorted`.

    Observations must be SORTED by landmark. Returns
    ``(boundary (N,) bool, last_of_lm (M,) int32)`` — segment-start
    flags and, per landmark, the index of its LAST observation
    (sentinel N for landmarks with no observations). One s32 scatter;
    hoist it out of iteration loops (it depends only on ``obs_lm``).
    """
    N = obs_lm.shape[0]
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), obs_lm[1:] != obs_lm[:-1]]
    )
    last = jnp.concatenate([boundary[1:], jnp.ones((1,), bool)])
    rowix = jnp.arange(N, dtype=jnp.int32)
    last_of_lm = (
        jnp.full((M,), N, jnp.int32)
        .at[jnp.where(last, obs_lm, M)]
        .set(rowix, mode="drop")
    )
    return boundary, last_of_lm


def _landmark_sum_sorted(vals, boundary, last_of_lm):
    """Per-landmark segment sum over SORTED observations:
    (N, ...) -> (M, ...).

    Segmented Hillis-Steele inclusive scan (value resets at segment
    boundaries — summation stays within-segment, no cancellation) +
    one M-row gather at each segment's last row; replaces the
    scatter-add at the ~45 ns/source-row floor with ~log2(N) fused
    elementwise passes (the ops/voxel.py pattern, measured there and on
    the BA bench).
    """
    N = vals.shape[0]
    flat = vals.reshape(N, -1)
    scan_vals, f = flat, boundary
    d = 1
    while d < N:
        vs = jnp.pad(scan_vals[:-d], ((d, 0), (0, 0)))
        fs = jnp.pad(f[:-d], (d, 0), constant_values=True)
        scan_vals = scan_vals + jnp.where(f[:, None], 0.0, vs)
        f = f | fs
        d *= 2
    M = last_of_lm.shape[0]
    has = last_of_lm < N
    out = jnp.take_along_axis(
        scan_vals, jnp.minimum(last_of_lm, N - 1)[:, None], axis=0
    )
    out = jnp.where(has[:, None], out, 0.0)
    return out.reshape((M,) + vals.shape[1:])


def _schur_coupling(L, obs_pose, obs_lm, V, W_obs, k_max):
    """Pose-pose Schur coupling sum_l U_l Hll^-1 U_l^T as (L, 6, L, 6).

    Observations MUST be sorted by landmark (each landmark's observations
    contiguous). The coupling expands into ordered observation PAIRS
    within each landmark segment: pair (n, n') contributes
    ``V_n W_n'^T`` at pose block (pose_n, pose_n'). Pairs at offset d are
    matched by shifting the sorted arrays — O(N * k_max) work and O(N)
    memory, never a dense (M, L) cross table. The offset loop is a
    ``lax.fori_loop`` (graph size O(1) in k_max — an earlier Python
    unroll put ~2*k_max scatter-adds in the traced graph and blew up
    compile time at k_max ~ 10^2).

    ``k_max``: static upper bound on observations per landmark. If the
    true max exceeds it, coupling pairs are silently dropped and the GN
    step is wrong — validated at the public entry points on concrete
    inputs (see :func:`ba_refine`).
    """
    N = obs_pose.shape[0]
    idx = jnp.arange(N)
    # MXU formulation for small-to-medium L: accumulate pair blocks with
    # one-hot matmuls, S_ab += P^T (A_ab * Q) where P/Q one-hot-encode
    # the pose indices of the two pair members. The scatter-add
    # formulation costs ~45 ns per (N,6,6) row PER OFFSET STEP (the
    # measured v5e 2D scatter floor — ~500 of 865 ms/GN-iter at
    # L=64/N=6e5, tools/bench_ba.py round 4); the matmul costs
    # 36*2*N*L^2 FLOPs on the MXU and XLA fuses the one-hot multiply
    # into the dot_general. The trade crosses back to the scatter around
    # L ~ 150-200 (FLOPs grow with L^2, the scatter does not).
    use_matmul = L <= _POSE_MATMUL_MAX_L
    if use_matmul:
        P = (
            obs_pose[:, None] == jnp.arange(L, dtype=obs_pose.dtype)[None]
        ).astype(V.dtype)  # (N, L)

    def _pair_accumulate(Pm, Qm, A):
        """sum_n Pm[n,p] A[n,a,b] Qm[n,q] -> (L,6,L,6) via 36 batched
        MXU matmuls (one per 6x6 block entry). The per-entry one-hot
        multiply feeds the dot_general directly so XLA fuses it into the
        operand load — no (N, 36, L) intermediate is materialized."""
        A36 = jnp.transpose(A.reshape(A.shape[0], 36), (1, 0))  # (36, N)

        def per_entry(col):
            return jax.lax.dot_general(
                Pm,
                Qm * col[:, None],
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=_HIGH,
            )  # (L, L)

        S36 = jax.vmap(per_entry)(A36)  # (36, L, L)
        return jnp.transpose(S36.reshape(6, 6, L, L), (2, 0, 3, 1))

    # d = 0: every observation pairs with itself
    A0 = jnp.einsum("nac,nbc->nab", V, W_obs, precision=_HIGH)  # (N, 6, 6)
    if use_matmul:
        S = _pair_accumulate(P, P, A0)  # (L, 6, L, 6)
    else:
        S = jnp.zeros((L, 6, L, 6), dtype=V.dtype)
        S = S.at[obs_pose, :, obs_pose, :].add(A0)

    def body(d, S):
        # pair (n, n+d), matched by rolling the sorted arrays; rows whose
        # partner wrapped past the end are masked off.
        lm_s = jnp.roll(obs_lm, -d, axis=0)
        pose_s = jnp.roll(obs_pose, -d, axis=0)
        W_s = jnp.roll(W_obs, -d, axis=0)
        valid = ((idx + d < N) & (obs_lm == lm_s)).astype(V.dtype)
        A = (
            jnp.einsum("nac,nbc->nab", V, W_s, precision=_HIGH)
            * valid[:, None, None]
        )
        if use_matmul:
            Q = (
                pose_s[:, None] == jnp.arange(L, dtype=pose_s.dtype)[None]
            ).astype(V.dtype)
            C = _pair_accumulate(P, Q, A)
            # (n+d, n) block = transpose of (n, n+d): V_m W_n^T =
            # (V_n W_m^T)^T because Hll^-1 is symmetric.
            return S + C + jnp.transpose(C, (2, 3, 0, 1))
        S = S.at[obs_pose, :, pose_s, :].add(A)
        S = S.at[pose_s, :, obs_pose, :].add(jnp.swapaxes(A, -1, -2))
        return S

    return jax.lax.fori_loop(1, min(k_max, N), body, S)


def _coupling_matvec(
    x, obs_pose, obs_lm, W_obs, Hll_inv, M, P=None, segs=None
):
    """(U Hll^-1 U^T) x without materializing the (L,6,L,6) coupling.

    O(N) per application: gather x by pose, per-landmark segment-sum,
    3x3 block solve, reduce back by pose. The two per-observation
    reductions use the segmented-scan / one-hot-matmul formulations
    (:func:`_landmark_sum_sorted`, :func:`_pose_sum`) when the
    loop-invariant prep (``P``, ``segs``) is supplied — inside CG these
    run every iteration, and the scatter-add floor dominated the solve
    (round-4 BA bench).
    """
    L = x.shape[0]
    t = jnp.einsum("nab,na->nb", W_obs, x[obs_pose], precision=_HIGH)  # (N,3)
    if segs is not None:
        s = _landmark_sum_sorted(t, *segs)
    else:
        s = jnp.zeros((M, 3), dtype=x.dtype).at[obs_lm].add(t)
    y = jnp.einsum("mab,mb->ma", Hll_inv, s, precision=_HIGH)  # (M, 3)
    c = jnp.einsum("nab,nb->na", W_obs, y[obs_lm], precision=_HIGH)  # (N,6)
    if P is not None or L <= _POSE_MATMUL_MAX_L:
        return _pose_sum(c, obs_pose, L, P=P)
    return jnp.zeros((L, 6), dtype=x.dtype).at[obs_pose].add(c)


def _pcg_iterations(matvec, rhs, Minv_blocks, iters):
    """Preconditioned conjugate gradients on (L, 6) block vectors.

    ``Minv_blocks`` (L, 6, 6): block-Jacobi preconditioner (inverted 6x6
    diagonal blocks of the system). Fixed iteration count (static control
    flow); with x0 = 0 the first iterate is the preconditioned gradient
    step, so even iters=1 makes progress. alpha/beta are zero-guarded so
    iterations past convergence are exact no-ops (0/0 otherwise).
    """

    def dot(a, b):
        return jnp.sum(a * b, dtype=a.dtype)

    def precond(v):
        return jnp.einsum("lab,lb->la", Minv_blocks, v, precision=_HIGH)

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = precond(r0)
    p0 = z0

    def body(_, state):
        x, r, z, p, rz = state
        Ap = matvec(p)
        pAp = dot(p, Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = dot(r, z)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta * p
        return x, r, z, p, rz_new

    state = (x0, r0, z0, p0, dot(r0, z0))
    x, *_ = jax.lax.fori_loop(0, iters, body, state)
    return x


def _pcg_solve(matvec, rhs, Minv_blocks, iters):
    """PCG with implicit differentiation.

    Differentiating THROUGH converged CG iterations is numerically
    unstable (search directions and pAp vanish at convergence; the
    reverse pass divides by them — observed NaN gradients). The system
    is symmetric positive definite, so ``lax.custom_linear_solve`` with
    ``symmetric=True`` gives the exact implicit gradient instead: the
    backward pass is ONE more PCG solve against the same operator.
    """
    return jax.lax.custom_linear_solve(
        matvec,
        rhs,
        solve=lambda mv, b: _pcg_iterations(mv, b, Minv_blocks, iters),
        symmetric=True,
    )


def _ba_iteration(
    poses,
    landmarks,
    obs_pose,
    obs_lm,
    obs_pts,
    weights,
    k_max,
    damping,
    anchor_weight,
    axis=None,
    solver="dense",
    cg_iters=64,
):
    """One Schur-complement GN iteration (obs sorted by landmark).

    With ``axis`` set (inside shard_map, observations partitioned by
    landmark ownership): H_cc, the coupling S, bc and the rhs coupling are
    per-shard partial sums psum-reduced over ``axis``; H_ll / bl /
    back-substitution stay shard-local because every landmark's
    observations are entirely on its owner shard.

    ``solver``:
      - ``'dense'``: materialize the reduced camera system (L,6,L,6) via
        pair expansion and solve with ``jnp.linalg.solve`` — exact, O(L^2)
        memory, O(L^3) solve; right at L up to a few hundred.
      - ``'pcg'``: matrix-free preconditioned CG on the Schur complement.
        S x is applied as Hcc x - U Hll^-1 U^T x in O(N) per CG step —
        no (L,6,L,6) tensor, no pair expansion, no k_max dependence.
        Block-Jacobi (6x6 pose-diagonal of S) preconditioner. Sharded:
        the per-shard partial matvec is psum-reduced, so CG runs
        replicated with one (L,6) psum per iteration.
    """
    L = poses.shape[0]
    M = landmarks.shape[0]
    N = obs_pose.shape[0]

    r, Jp, Jl = _ba_linearize(
        poses, landmarks, obs_pose, obs_lm, obs_pts, weights
    )

    # Loop-invariant reduction prep (obs_lm/obs_pose are fixed inputs):
    # segment boundaries for the sorted-by-landmark sums and the one-hot
    # pose encoding. The per-observation reductions then run as
    # segmented scans / skinny MXU matmuls instead of scatter-adds at
    # the ~45 ns/source-row floor (round-4 BA bench: this floor WAS the
    # solver cost).
    segs = _landmark_segments(obs_lm, M)
    P = (
        _one_hot_poses(obs_pose, L, poses.dtype)
        if L <= _POSE_MATMUL_MAX_L
        else None
    )

    # landmark-indexed sums in ONE pass: [Jl^T Jl (9) | Jl^T r (3)]
    lm_vals = jnp.concatenate(
        [
            jnp.einsum("nab,nac->nbc", Jl, Jl, precision=_HIGH).reshape(
                N, 9
            ),
            jnp.einsum("nab,na->nb", Jl, r, precision=_HIGH),
        ],
        axis=-1,
    )
    lm_sums = _landmark_sum_sorted(lm_vals, *segs)  # (M, 12)
    Hll = lm_sums[:, 0:9].reshape(M, 3, 3)
    bl = lm_sums[:, 9:12]

    W_obs = jnp.einsum("nab,nac->nbc", Jp, Jl, precision=_HIGH)  # (N, 6, 3)

    # invert landmark blocks (damped). Sharded: local Hll is COMPLETE for
    # owned landmarks (landmark-ownership partition) and zero elsewhere,
    # so no psum is needed — non-owned blocks invert to I/damping but
    # never contribute (their V/bl/W rows are all on the owner shard).
    Hll = Hll + jnp.eye(3, dtype=poses.dtype) * damping
    Hll_inv = jnp.linalg.inv(Hll)  # (M, 3, 3)

    V = jnp.einsum("nab,nbc->nac", W_obs, Hll_inv[obs_lm], precision=_HIGH)

    # pose-indexed sums in ONE pass:
    # [Jp^T Jp (36) | Jp^T r (6) | V bl[lm] (6)]
    pose_vals = jnp.concatenate(
        [
            jnp.einsum("nab,nac->nbc", Jp, Jp, precision=_HIGH).reshape(
                N, 36
            ),
            jnp.einsum("nab,na->nb", Jp, r, precision=_HIGH),
            jnp.einsum("nab,nb->na", V, bl[obs_lm], precision=_HIGH),
        ],
        axis=-1,
    )
    pose_sums = _pose_sum(pose_vals, obs_pose, L, P=P)  # (L, 48)
    Hcc = pose_sums[:, 0:36].reshape(L, 6, 6)
    bc = pose_sums[:, 36:42]
    # rhs coupling: rhs_p -= sum_{n: pose p} V_n bl[lm_n]
    coup = pose_sums[:, 42:48]

    eye6 = jnp.eye(6, dtype=poses.dtype)
    anchor = jnp.zeros((L, 1, 1), poses.dtype).at[0].set(1.0) * (
        anchor_weight * eye6
    )  # (L, 6, 6): anchor_weight * I on pose 0 only

    if solver == "dense":
        S = _schur_coupling(L, obs_pose, obs_lm, V, W_obs, k_max)
        Hcc_full = Hcc
        if axis is not None:
            Hcc_full = jax.lax.psum(Hcc, axis)
            S = jax.lax.psum(S, axis)
            bc = jax.lax.psum(bc, axis)
            coup = jax.lax.psum(coup, axis)
        Sfull = -S
        Sfull = Sfull.at[jnp.arange(L), :, jnp.arange(L), :].add(
            Hcc_full + anchor
        )
        rhs = bc - coup
        Sm = Sfull.reshape(L * 6, L * 6) + jnp.eye(
            L * 6, dtype=poses.dtype
        ) * damping
        delta_c = jnp.linalg.solve(Sm, -rhs.reshape(L * 6)).reshape(L, 6)
    else:  # pcg — matrix-free reduced camera system
        # 6x6 pose-diagonal of S (self-pair d=0 terms only) for the
        # block-Jacobi preconditioner.
        # Per-observation difference BEFORE the reduction: Hcc and the
        # self-coupling are each ~1e5-magnitude sums whose difference is
        # damping-scale small — reducing them separately (two
        # independently-rounded 600k-element sums) leaves noise larger
        # than the difference, the block-Jacobi blocks can go indefinite,
        # and the guarded CG iterations freeze at an unconverged point
        # (observed on the real chip at M=1e5: pose_shift 0.014 vs the
        # dense solver's 0.001). Summing the per-observation difference
        # keeps the cancellation exact.
        diag_S = _pose_sum(
            jnp.einsum("nab,nac->nbc", Jp, Jp, precision=_HIGH)
            - jnp.einsum("nac,nbc->nab", V, W_obs, precision=_HIGH),
            obs_pose, L, P=P,
        )
        if axis is not None:
            diag_S = jax.lax.psum(diag_S, axis)
            bc = jax.lax.psum(bc, axis)
            coup = jax.lax.psum(coup, axis)
        diag_S = diag_S + anchor + damping * eye6
        Minv = jnp.linalg.inv(diag_S)
        rhs = bc - coup

        def matvec(x):
            hx = jnp.einsum("lbc,lc->lb", Hcc, x, precision=_HIGH)
            cx = _coupling_matvec(
                x, obs_pose, obs_lm, W_obs, Hll_inv, M, P=P, segs=segs
            )
            part = hx - cx
            if axis is not None:
                part = jax.lax.psum(part, axis)
            # replicated terms added once, after the partial-sum reduce
            ax = jnp.einsum("lbc,lc->lb", anchor, x, precision=_HIGH)
            return part + ax + damping * x

        delta_c = _pcg_solve(matvec, -rhs, Minv, cg_iters)

    # back-substitute landmarks: delta_l = -Hll^-1 (bl + W^T delta_c).
    # Shard-local; non-owned landmarks get exactly 0 (bl and Wt_dc zero),
    # so the cross-shard psum of deltas recovers every owner's update.
    Wt_dc = jnp.zeros((M, 3), dtype=poses.dtype)
    Wt_dc = Wt_dc.at[obs_lm].add(
        jnp.einsum("nbc,nb->nc", W_obs, delta_c[obs_pose], precision=_HIGH)
    )
    delta_l = -jnp.einsum("mab,mb->ma", Hll_inv, bl + Wt_dc, precision=_HIGH)
    if axis is not None:
        delta_l = jax.lax.psum(delta_l, axis)

    return jnp.matmul(se3_exp(delta_c), poses), landmarks + delta_l


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_iters", "max_obs_per_landmark", "solver", "cg_iters"
    ),
)
def _ba_refine_impl(
    poses,
    landmarks,
    obs_pose,
    obs_lm,
    obs_pts,
    weights,
    num_iters,
    damping,
    anchor_weight,
    max_obs_per_landmark,
    solver,
    cg_iters,
):
    L = poses.shape[0]
    N = obs_pts.shape[0]
    if weights is None:
        weights = jnp.ones((N,), dtype=poses.dtype)
    k_max = L if max_obs_per_landmark is None else max_obs_per_landmark

    # sort once so each landmark's observations are contiguous
    order = jnp.argsort(obs_lm)
    obs_pose = obs_pose[order]
    obs_lm = obs_lm[order]
    obs_pts = obs_pts[order]
    weights = weights[order]

    def body(_, state):
        poses, landmarks = state
        return _ba_iteration(
            poses,
            landmarks,
            obs_pose,
            obs_lm,
            obs_pts,
            weights,
            k_max,
            damping,
            anchor_weight,
            solver=solver,
            cg_iters=cg_iters,
        )

    return jax.lax.fori_loop(0, num_iters, body, (poses, landmarks))


def _validate_k_max(obs_lm, max_obs_per_landmark, solver):
    """Rejects a too-small dense-path pair bound on CONCRETE indices.

    ``max_obs_per_landmark`` is a silent-correctness parameter for the
    dense solver: if any landmark has more observations than the bound,
    :func:`_schur_coupling` drops coupling pairs and the GN step is
    wrong with no error. When the indices are concrete (not traced),
    check the true max and raise. Traced inputs (calls from inside an
    outer jit) skip the check — the bound is then the caller's contract.
    The 'pcg' solver has no pair expansion and ignores the bound.
    """
    if solver != "dense" or max_obs_per_landmark is None:
        return
    if isinstance(obs_lm, jax.core.Tracer):
        return
    import numpy as np

    counts = np.bincount(np.asarray(obs_lm))
    true_max = int(counts.max()) if counts.size else 0
    if true_max > max_obs_per_landmark:
        raise ValueError(
            f"max_obs_per_landmark={max_obs_per_landmark} but a landmark "
            f"has {true_max} observations: the dense Schur coupling would "
            f"silently drop pairs and produce a wrong Gauss-Newton step. "
            f"Pass max_obs_per_landmark>={true_max} or solver='pcg' "
            f"(no pair bound)."
        )


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
    max_obs_per_landmark: Optional[int] = None,
    solver: str = "dense",
    cg_iters: int = 64,
):
    """Point-landmark bundle adjustment with Schur-complement elimination.

    The landmark block H_ll is 3x3 block-diagonal and eliminated
    analytically; only the reduced camera system is solved — either
    materialized dense (``solver='dense'``: O(L^2) memory, exact
    ``linalg.solve``; right for L up to a few hundred) or matrix-free
    (``solver='pcg'``: block-Jacobi preconditioned CG, O(N + L + M)
    memory per iteration, no pair expansion — scales to thousands of
    poses). The dense pose-pose coupling is accumulated from observation
    pairs within each landmark's segment (observations are sorted by
    landmark internally) — memory O(N + L^2 + M), compute
    O(N * max_obs_per_landmark).

    Args:
        poses: (L, 4, 4); landmarks: (M, 3).
        obs_pose / obs_lm: (N,) int32 indices; obs_pts: (N, 3).
        weights: optional (N,) observation weights.
        max_obs_per_landmark: static bound on observations of one
            landmark (defaults to L — tighten it for large L). Dense
            solver only; a bound below the true max silently drops
            coupling pairs, so concrete inputs are validated against it.
        solver: 'dense' or 'pcg'.
        cg_iters: CG iterations per GN step (pcg only).

    Returns:
        (refined_poses (L, 4, 4), refined_landmarks (M, 3)).
    """
    if solver not in ("dense", "pcg"):
        raise ValueError(f"solver must be 'dense' or 'pcg', got {solver!r}")
    _validate_k_max(obs_lm, max_obs_per_landmark, solver)
    return _ba_refine_impl(
        poses,
        landmarks,
        obs_pose,
        obs_lm,
        obs_pts,
        weights,
        num_iters,
        damping,
        anchor_weight,
        max_obs_per_landmark,
        solver,
        cg_iters,
    )


def partition_observations_by_landmark(obs_pose, obs_lm, obs_pts, weights, n):
    """Host-side prep for :func:`ba_refine_sharded`.

    Sorts observations by landmark and splits them into ``n`` shards at
    landmark boundaries (every landmark's observations land on exactly
    one shard — "landmark ownership"), padding shards to equal length
    with weight-0 observations.

    Returns (obs_pose (n, Ns), obs_lm (n, Ns), obs_pts (n, Ns, 3),
    weights (n, Ns), max_obs_per_landmark).
    """
    import numpy as np

    obs_pose = np.asarray(obs_pose)
    obs_lm = np.asarray(obs_lm)
    obs_pts = np.asarray(obs_pts)
    weights = np.asarray(weights)
    N = obs_lm.shape[0]

    order = np.argsort(obs_lm, kind="stable")
    obs_pose, obs_lm, obs_pts, weights = (
        obs_pose[order],
        obs_lm[order],
        obs_pts[order],
        weights[order],
    )
    uniq, starts, counts = np.unique(
        obs_lm, return_index=True, return_counts=True
    )
    k_max = int(counts.max()) if counts.size else 1
    # segment s goes to the shard its cumulative midpoint falls in
    cum = np.cumsum(counts) - counts / 2.0
    shard_of_seg = np.minimum((cum * n / max(N, 1)).astype(int), n - 1)

    per_shard = [[] for _ in range(n)]
    for s, st, c in zip(shard_of_seg, starts, counts):
        per_shard[s].append((st, c))
    Ns = max(
        (sum(c for _, c in segs) for segs in per_shard), default=1
    )
    Ns = max(Ns, 1)

    out_pose = np.zeros((n, Ns), obs_pose.dtype)
    out_lm = np.zeros((n, Ns), obs_lm.dtype)
    out_pts = np.zeros((n, Ns, 3), obs_pts.dtype)
    out_w = np.zeros((n, Ns), weights.dtype)
    for s, segs in enumerate(per_shard):
        o = 0
        for st, c in segs:
            sl = slice(st, st + c)
            out_pose[s, o : o + c] = obs_pose[sl]
            out_lm[s, o : o + c] = obs_lm[sl]
            out_pts[s, o : o + c] = obs_pts[sl]
            out_w[s, o : o + c] = weights[sl]
            o += c
        # Padding rows carry the shard's LAST owned landmark id (not 0):
        # each shard's observation list must stay SORTED by landmark for
        # the segmented-scan reductions — a trailing run of lm 0 would
        # form a bogus segment whose scan total (zero) OVERWRITES
        # landmark 0's real sums on its owner shard. With the last owned
        # id, the zero-weight pads join the final real segment and
        # contribute nothing.
        if o and o < Ns:
            out_lm[s, o:] = out_lm[s, o - 1]
    return out_pose, out_lm, out_pts, out_w, k_max


def ba_refine_sharded(
    poses: jnp.ndarray,
    landmarks: jnp.ndarray,
    obs_pose: jnp.ndarray,
    obs_lm: jnp.ndarray,
    obs_pts: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
    weights: Optional[jnp.ndarray] = None,
    num_iters: int = 5,
    damping: float = 1e-4,
    anchor_weight: float = 1e6,
    solver: str = "dense",
    cg_iters: int = 64,
):
    """Distributed Schur-complement BA (SURVEY §2.9 north-star deliverable).

    Observations are partitioned over the mesh by LANDMARK OWNERSHIP
    (:func:`partition_observations_by_landmark`): each landmark's
    observations are entirely on one shard, so its 3x3 H_ll block, its
    Schur coupling pairs, and its back-substitution are shard-local.
    With ``solver='dense'``, cross-shard communication is exactly four
    psums per iteration — the (L,6,6) H_cc blocks, the (L,6,L,6)
    coupling, the (L,6) gradient and rhs coupling — plus one (M,3) psum
    of landmark deltas; per-shard memory is O(N/n + L^2 + M). The pair
    bound ``k_max`` is computed from the data here (the partitioner sees
    concrete indices), so the dense path never drops pairs. With
    ``solver='pcg'`` the (L,6,L,6) coupling never exists: each CG step
    psums one (L,6) partial matvec — per-shard memory O(N/n + L + M),
    scaling to thousands of poses.

    Returns (refined_poses (L, 4, 4), refined_landmarks (M, 3)).
    """
    from jax.experimental.shard_map import shard_map

    if solver not in ("dense", "pcg"):
        raise ValueError(f"solver must be 'dense' or 'pcg', got {solver!r}")
    n = mesh.shape[axis]
    N = obs_pts.shape[0]
    if weights is None:
        weights = jnp.ones((N,), dtype=poses.dtype)
    s_pose, s_lm, s_pts, s_w, k_max = partition_observations_by_landmark(
        obs_pose, obs_lm, obs_pts, weights, n
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        # custom_linear_solve (the implicitly-differentiated PCG) does
        # not propagate replication/varying-axis tracking, so the solved
        # delta would be flagged varying over the mesh axis even though
        # every shard computes the identical replicated value (the psum
        # inside the matvec guarantees it) — disable the check.
        check_rep=False,
    )
    def refine(poses, landmarks, op, ol, opts_, ow):
        op, ol, opts_, ow = op[0], ol[0], opts_[0], ow[0]

        def body(_, state):
            p, lm = state
            return _ba_iteration(
                p, lm, op, ol, opts_, ow, k_max, damping, anchor_weight,
                axis=axis, solver=solver, cg_iters=cg_iters,
            )

        return jax.lax.fori_loop(0, num_iters, body, (poses, landmarks))

    return jax.jit(refine)(
        poses,
        landmarks,
        jnp.asarray(s_pose),
        jnp.asarray(s_lm),
        jnp.asarray(s_pts),
        jnp.asarray(s_w),
    )
