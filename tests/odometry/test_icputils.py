import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.geometry import se3_exp, transform_pointcloud
from gradslam_tpu.odometry import (
    gauss_newton_solve,
    point_to_plane_ICP,
    point_to_plane_gradICP,
    solve_linear_system,
)
from gradslam_tpu.structures import RGBDImages
from gradslam_tpu.structures.utils import pointclouds_from_rgbdimages


def golden_cloud(msrd_data, batch=0, frame=0, stride=7):
    """A real point cloud + normals from the golden fixture."""
    rgbd = RGBDImages(
        msrd_data["colors"][:1, :1],
        msrd_data["depths"][:1, :1],
        msrd_data["intrinsics"][:1],
        msrd_data["poses"][:1, :1],
    )
    pc = pointclouds_from_rgbdimages(rgbd)
    n = int(pc.num_points_per_pointcloud[0])
    pts = np.asarray(pc.points_padded[0, :n])[::stride]
    nrm = np.asarray(pc.normals_padded[0, :n])[::stride]
    return jnp.asarray(pts[None]), jnp.asarray(nrm[None])


class TestSolveLinearSystem:
    def test_residual_small(self):
        # well-conditioned random system: normal-equation solution has small
        # residual in the least-squares sense (reference test_icputils.py:20-49)
        rng = np.random.RandomState(0)
        A = jnp.asarray(rng.randn(100, 6).astype(np.float32))
        x_true = rng.randn(6, 1).astype(np.float32)
        b = jnp.asarray(np.asarray(A) @ x_true)
        x = solve_linear_system(A, b, damp=1e-8)
        np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-3)

    def test_weights_filter_rows(self):
        rng = np.random.RandomState(1)
        A = jnp.asarray(rng.randn(50, 6).astype(np.float32))
        x_true = rng.randn(6, 1).astype(np.float32)
        b = jnp.asarray(np.asarray(A) @ x_true)
        # corrupt second half of rows, weight them out
        b_bad = b.at[25:].add(100.0)
        w = jnp.concatenate([jnp.ones(25), jnp.zeros(25)])
        x = solve_linear_system(A, b_bad, damp=1e-8, weights=w)
        np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-2)

    def test_batched(self):
        rng = np.random.RandomState(2)
        A = jnp.asarray(rng.randn(3, 40, 6).astype(np.float32))
        b = jnp.asarray(rng.randn(3, 40, 1).astype(np.float32))
        x = solve_linear_system(A, b, damp=1e-4)
        assert x.shape == (3, 6, 1)

    def test_differentiable_wrt_damp(self):
        rng = np.random.RandomState(3)
        A = jnp.asarray(rng.randn(30, 6).astype(np.float32))
        b = jnp.asarray(rng.randn(30, 1).astype(np.float32))
        g = jax.grad(lambda d: jnp.sum(solve_linear_system(A, b, d) ** 2))(
            jnp.float32(0.1)
        )
        assert np.isfinite(float(g))


class TestGaussNewton:
    def test_zero_residual_when_aligned(self, msrd_data):
        pts, nrm = golden_cloud(msrd_data)
        A, b, w, idx = gauss_newton_solve(pts, pts, nrm)
        np.testing.assert_allclose(np.asarray(b), 0.0, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx[0]), np.arange(pts.shape[1]))

    def test_dist_thresh_weights(self):
        src = jnp.asarray([[[0.0, 0, 0], [10.0, 0, 0]]])
        tgt = jnp.asarray([[[0.1, 0, 0], [0.2, 0, 0]]])
        nrm = jnp.asarray([[[1.0, 0, 0], [1.0, 0, 0]]])
        A, b, w, idx = gauss_newton_solve(src, tgt, nrm, dist_thresh=1.0)
        np.testing.assert_array_equal(np.asarray(w[0]), [1.0, 0.0])


def _known_transform(rot=0.1, trans=0.02):
    """Small SE(3) like the reference oracle (rotation ~0.1 rad +
    ~0.05 m translation, tests/odometry/test_gradicp.py:27-60)."""
    xi = jnp.asarray([trans, -trans, trans, rot, -rot, rot * 0.5], jnp.float32)
    return se3_exp(xi)


class TestSyntheticRecovery:
    @pytest.mark.parametrize("solver", [point_to_plane_ICP, point_to_plane_gradICP])
    def test_recover_known_transform(self, msrd_data, solver):
        src, _ = golden_cloud(msrd_data)
        T_true = _known_transform()
        tgt = transform_pointcloud(src, T_true[None])
        # recompute normals in target frame from the source normals
        _, nrm = golden_cloud(msrd_data)
        from gradslam_tpu.geometry import transform_normals

        tgt_nrm = transform_normals(nrm, T_true[None])
        T = solver(src, tgt, tgt_nrm, numiters=30, dist_thresh=0.2)
        np.testing.assert_allclose(
            np.asarray(T[0]), np.asarray(T_true), atol=2e-3
        )

    def test_gradicp_jit_compiles(self, msrd_data):
        src, nrm = golden_cloud(msrd_data)
        T_true = _known_transform()
        tgt = transform_pointcloud(src, T_true[None])
        from gradslam_tpu.geometry import transform_normals

        tgt_nrm = transform_normals(nrm, T_true[None])
        f = jax.jit(
            lambda s, t, n: point_to_plane_gradICP(s, t, n, numiters=10)
        )
        T = f(src, tgt, tgt_nrm)
        assert T.shape == (1, 4, 4)

    def test_gradicp_differentiable(self, msrd_data):
        """Gradients flow from the recovered transform back to the source
        points (the reference left this commented out —
        test_icputils.py:510-534; we assert it numerically)."""
        src, nrm = golden_cloud(msrd_data, stride=29)
        T_true = _known_transform()
        tgt = transform_pointcloud(src, T_true[None])
        from gradslam_tpu.geometry import transform_normals

        tgt_nrm = transform_normals(nrm, T_true[None])

        def loss(s):
            T = point_to_plane_gradICP(s, tgt, tgt_nrm, numiters=3)
            return jnp.sum((T - jnp.eye(4)) ** 2)

        g = jax.grad(loss)(src)
        assert g.shape == src.shape
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.max(jnp.abs(g))) > 0.0

    def test_gradicp_gradcheck_float64(self):
        """Float64 finite-difference gradcheck of the FULL gradICP solve —
        the check the reference ships commented out
        (tests/odometry/test_icputils.py:244,510-534). AD gradients of a
        trajectory-style loss w.r.t. the source points must match central
        differences. (KNN association indices are piecewise-constant; the
        perturbation is small enough not to flip any association.)"""
        import jax

        with jax.enable_x64(True):
            rng = np.random.RandomState(3)
            src = jnp.asarray(rng.uniform(-1, 1, (1, 24, 3)))
            T_true = se3_exp(
                jnp.asarray([0.02, -0.01, 0.015, 0.05, -0.04, 0.03])
            )
            tgt = transform_pointcloud(src, T_true[None])
            nrm = rng.randn(1, 24, 3)
            nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
            from gradslam_tpu.geometry import transform_normals

            tgt_nrm = transform_normals(jnp.asarray(nrm), T_true[None])

            def loss(s):
                T = point_to_plane_gradICP(s, tgt, tgt_nrm, numiters=4)
                return jnp.sum(T[:, :3, 3] ** 2) + jnp.sum(T[:, :3, :3])

            g = np.asarray(jax.grad(loss)(src))
            eps = 1e-6
            for i, j in [(0, 0), (5, 1), (11, 2), (17, 0), (23, 1)]:
                d = np.zeros((1, 24, 3))
                d[0, i, j] = eps
                fd = (
                    float(loss(src + d)) - float(loss(src - d))
                ) / (2 * eps)
                np.testing.assert_allclose(
                    g[0, i, j], fd, rtol=5e-4, atol=1e-8,
                    err_msg=f"grad mismatch at point {i} coord {j}",
                )

    def test_batched_consistency(self, msrd_data):
        # solving a batch of 2 identical problems gives identical answers
        src, nrm = golden_cloud(msrd_data, stride=11)
        T_true = _known_transform()
        tgt = transform_pointcloud(src, T_true[None])
        from gradslam_tpu.geometry import transform_normals

        tgt_nrm = transform_normals(nrm, T_true[None])
        src2 = jnp.concatenate([src, src])
        tgt2 = jnp.concatenate([tgt, tgt])
        nrm2 = jnp.concatenate([tgt_nrm, tgt_nrm])
        T = point_to_plane_gradICP(src2, tgt2, nrm2, numiters=10)
        np.testing.assert_allclose(np.asarray(T[0]), np.asarray(T[1]), atol=1e-6)


class TestRobustWeights:
    def test_huber_downweights_outliers(self):
        from gradslam_tpu.odometry import huber_weights

        r = jnp.asarray([0.01, 0.05, 0.5, 5.0])
        w = np.asarray(huber_weights(r, delta=0.1))
        np.testing.assert_allclose(w[:2], 1.0)
        np.testing.assert_allclose(w[2], 0.2, rtol=1e-5)
        np.testing.assert_allclose(w[3], 0.02, rtol=1e-5)

    def test_robust_icp_resists_outliers(self, msrd_data):
        """With a corrupted target region, robust gradICP recovers the
        transform better than plain least squares."""
        src, nrm = golden_cloud(msrd_data, stride=11)
        T_true = _known_transform()
        tgt = transform_pointcloud(src, T_true[None])
        from gradslam_tpu.geometry import transform_normals

        tgt_nrm = transform_normals(nrm, T_true[None])
        # corrupt 10% of target points
        n = tgt.shape[1]
        k = n // 10
        tgt_bad = tgt.at[:, :k].add(0.5)

        T_plain = point_to_plane_gradICP(
            src, tgt_bad, tgt_nrm, numiters=20, dist_thresh=0.2
        )
        T_robust = point_to_plane_gradICP(
            src, tgt_bad, tgt_nrm, numiters=20, dist_thresh=0.2,
            robust_delta=0.02,
        )
        err_plain = float(jnp.abs(T_plain[0] - T_true).max())
        err_robust = float(jnp.abs(T_robust[0] - T_true).max())
        assert err_robust < err_plain
        assert err_robust < 0.03
