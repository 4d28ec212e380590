"""Differentiability of the refinement stack (VERDICT r2 weak #8).

The framework mandate is end-to-end differentiability; these tests prove
gradients flow THROUGH pose-graph refinement, bundle adjustment and the
full loop-closure pipeline with float64 finite-difference checks (same
style as tests/odometry/test_icputils.py — the check the reference left
commented out).

Intentionally stop-gradiented (piecewise-constant, so AD treats them as
locally constant — standard straight-through treatment):
  - KNN association indices (ops/knn.py argmin) — gradients flow through
    the GATHERED coordinates, not the index choice;
  - loop-closure candidate selection (lax.top_k in detect_*) and the
    inlier accept/reject threshold in verify_loop_closures — the edge
    WEIGHTS are locally constant, the edge MEASUREMENTS (ICP solves) are
    differentiable.
A finite-difference step small enough not to flip any index/threshold
therefore must match AD exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _fresh_compile_caches():
    """Drop compiled-program caches before each x64 gradcheck.

    Toggling ``jax.enable_x64`` after a long mixed-precision session has
    segfaulted the XLA CPU compiler in-suite (reproducible at
    TestPoseGraphGrad::test_grad_wrt_measurements_float64 when the whole
    tests/slam directory runs first; the same test passes in isolation).
    Clearing the caches isolates these compiles from the accumulated
    state and costs only the recompile of five small programs."""
    jax.clear_caches()
    yield

from gradslam_tpu.geometry import se3_exp
from gradslam_tpu.parallel.pose_refine import (
    PoseGraph,
    ba_refine,
    pose_graph_refine,
)
from gradslam_tpu.slam import close_loops


def _fd_check(loss, x, coords, rtol=5e-4, atol=1e-8, eps=1e-6):
    g = np.asarray(jax.grad(loss)(x))
    for idx in coords:
        d = np.zeros(x.shape)
        d[idx] = eps
        d = jnp.asarray(d)
        fd = (float(loss(x + d)) - float(loss(x - d))) / (2 * eps)
        np.testing.assert_allclose(
            g[idx], fd, rtol=rtol, atol=atol,
            err_msg=f"grad mismatch at {idx}",
        )
    return g


class TestPoseGraphGrad:
    def test_grad_wrt_measurements_float64(self):
        """d(refined trajectory loss)/d(edge measurements) matches
        central differences — the GN loop (jacfwd linearization +
        linalg.solve + se3_exp retraction) is differentiable end to
        end."""
        with jax.enable_x64(True):
            rng = np.random.RandomState(0)
            L = 5
            poses = [np.eye(4)]
            for _ in range(L - 1):
                poses.append(
                    poses[-1]
                    @ np.asarray(se3_exp(jnp.asarray(rng.randn(6) * 0.1)))
                )
            poses = jnp.asarray(np.stack(poses))
            edges = jnp.asarray(
                [[i, i + 1] for i in range(L - 1)] + [[0, L - 1]],
                dtype=jnp.int32,
            )
            Z = jnp.stack(
                [
                    jnp.matmul(jnp.linalg.inv(poses[i]), poses[j])
                    for i, j in np.asarray(edges)
                ]
            )
            weights = jnp.ones((edges.shape[0],))

            def loss(Zm):
                g = PoseGraph(poses, edges, Zm, weights)
                refined = pose_graph_refine(g, num_iters=3, damping=1e-8)
                return jnp.sum(refined[:, :3, 3] ** 2) + jnp.sum(
                    refined[:, :3, :3] * 0.1
                )

            g = _fd_check(
                loss, Z,
                [(0, 0, 3), (1, 1, 3), (2, 0, 0), (4, 2, 3), (3, 1, 1)],
            )
            assert np.isfinite(g).all()

    def test_grad_wrt_poses_and_weights(self):
        """Gradients also flow to the initial poses and edge weights
        (both finite, weights nonzero where edges disagree)."""
        with jax.enable_x64(True):
            rng = np.random.RandomState(1)
            L = 4
            poses = [np.eye(4)]
            for _ in range(L - 1):
                poses.append(
                    poses[-1]
                    @ np.asarray(se3_exp(jnp.asarray(rng.randn(6) * 0.1)))
                )
            poses = jnp.asarray(np.stack(poses))
            edges = jnp.asarray(
                [[0, 1], [1, 2], [2, 3], [0, 3]], dtype=jnp.int32
            )
            # slightly inconsistent measurements so weights matter
            Z = jnp.stack(
                [
                    jnp.matmul(jnp.linalg.inv(poses[i]), poses[j])
                    @ jnp.asarray(
                        np.asarray(
                            se3_exp(jnp.asarray(rng.randn(6) * 0.01))
                        )
                    )
                    for i, j in np.asarray(edges)
                ]
            )

            def loss_w(w):
                g = PoseGraph(poses, edges, Z, w)
                refined = pose_graph_refine(g, num_iters=3)
                return jnp.sum(refined[:, :3, 3] ** 2)

            gw = np.asarray(jax.grad(loss_w)(jnp.ones(4)))
            assert np.isfinite(gw).all()
            assert np.abs(gw).max() > 0


class TestBAGrad:
    def test_grad_wrt_observations_float64(self):
        """d(refined poses+landmarks)/d(observed points) through the
        Schur-complement GN loop matches central differences (both
        solvers)."""
        with jax.enable_x64(True):
            rng = np.random.RandomState(2)
            L, M = 3, 8
            poses = [np.eye(4)]
            for _ in range(L - 1):
                poses.append(
                    poses[-1]
                    @ np.asarray(se3_exp(jnp.asarray(rng.randn(6) * 0.1)))
                )
            poses = np.stack(poses)
            lms = rng.randn(M, 3) * 2 + [0, 0, 5]
            op, ol, opts = [], [], []
            for p in range(L):
                tinv = np.linalg.inv(poses[p])
                for l in range(M):
                    op.append(p)
                    ol.append(l)
                    opts.append(tinv[:3, :3] @ lms[l] + tinv[:3, 3])
            op = jnp.asarray(np.asarray(op, np.int32))
            ol = jnp.asarray(np.asarray(ol, np.int32))
            obs = jnp.asarray(np.stack(opts))
            poses_j = jnp.asarray(poses)
            lms_j = jnp.asarray(lms)

            for solver in ("dense", "pcg"):
                def loss(o):
                    p2, l2 = ba_refine(
                        poses_j, lms_j, op, ol, o,
                        num_iters=2, damping=1e-8, solver=solver,
                        cg_iters=40,
                    )
                    return jnp.sum(p2[:, :3, 3] ** 2) + jnp.sum(l2**2)

                g = _fd_check(
                    loss, obs, [(0, 0), (5, 1), (11, 2), (17, 0)],
                    rtol=1e-3,
                )
                assert np.isfinite(g).all()


class TestCloseLoopsGrad:
    def test_grad_wrt_frame_points_float64(self):
        """d(post-loop-closure trajectory)/d(frame points): gradients
        flow through ICP verification and the pose-graph solve. The
        candidate indices, KNN associations and accept thresholds are
        locally constant (see module docstring), so small central
        differences must match AD."""
        with jax.enable_x64(True):
            rng = np.random.RandomState(3)
            L, N = 5, 24
            world = rng.uniform(-1, 1, (N, 3))
            world[:, 2] += 4
            normals = rng.randn(N, 3)
            normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
            true_poses, pts, nrms = [], [], []
            for k in range(L):
                ang = 2 * np.pi * k / (L - 1)
                T = np.eye(4)
                T[:3, 3] = 0.1 * np.array(
                    [np.cos(ang) - 1.0, np.sin(ang), 0.0]
                )
                true_poses.append(T)
                Ti = np.linalg.inv(T)
                pts.append(world @ Ti[:3, :3].T + Ti[:3, 3])
                nrms.append(normals @ Ti[:3, :3].T)
            # drifted
            drifted = [true_poses[0]]
            for k in range(1, L):
                inc = np.linalg.inv(true_poses[k - 1]) @ true_poses[k]
                xi = rng.randn(6) * 0.01
                drifted.append(
                    drifted[-1]
                    @ (np.asarray(se3_exp(jnp.asarray(xi))) @ inc)
                )
            drifted = jnp.asarray(np.stack(drifted))
            pts_j = jnp.asarray(np.stack(pts))
            nrm_j = jnp.asarray(np.stack(nrms))
            val = jnp.ones((L, N), bool)

            def loss(p):
                refined, cand, w = close_loops(
                    drifted, p, nrm_j, val,
                    max_candidates=2, min_separation=3, max_distance=0.5,
                    icp_numiters=3, refine_iters=2,
                )
                return jnp.sum(refined[:, :3, 3] ** 2)

            # make sure a loop edge is actually accepted (otherwise this
            # only tests the odometry chain)
            _, _, w = close_loops(
                drifted, pts_j, nrm_j, val,
                max_candidates=2, min_separation=3, max_distance=0.5,
                icp_numiters=3, refine_iters=2,
            )
            assert bool((w > 0).any())

            g = _fd_check(
                loss, pts_j,
                [(0, 0, 0), (4, 5, 2), (2, 11, 1), (4, 20, 0)],
                rtol=1e-3, atol=1e-9,
            )
            assert np.isfinite(g).all()
