import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.geometry import (
    homogenize_points,
    inverse_intrinsics,
    project_points,
    unhomogenize_points,
    unproject_points,
)


class TestHomogenize:
    def test_shapes(self):
        for shape in [(10, 3), (2, 10, 3), (2, 5, 10, 2)]:
            pts = jnp.ones(shape)
            out = homogenize_points(pts)
            assert out.shape == shape[:-1] + (shape[-1] + 1,)
            np.testing.assert_allclose(out[..., -1], 1.0)

    def test_values(self):
        pts = jnp.array([[1.0, 2.0, 3.0]])
        out = homogenize_points(pts)
        np.testing.assert_allclose(out, [[1.0, 2.0, 3.0, 1.0]])


class TestUnhomogenize:
    def test_round_trip(self):
        pts = jnp.asarray(np.random.RandomState(0).randn(4, 7, 3).astype(np.float32))
        np.testing.assert_allclose(
            unhomogenize_points(homogenize_points(pts)), pts, rtol=1e-6
        )

    def test_w_division(self):
        pts = jnp.array([[2.0, 4.0, 2.0]])
        np.testing.assert_allclose(unhomogenize_points(pts), [[1.0, 2.0]])

    def test_small_w_guard(self):
        # |w| <= eps passes through unscaled (reference projutils.py:87)
        pts = jnp.array([[2.0, 4.0, 1e-8]])
        np.testing.assert_allclose(unhomogenize_points(pts), [[2.0, 4.0]])

    def test_raises_on_scalar_lastdim(self):
        with pytest.raises(ValueError):
            unhomogenize_points(jnp.ones((4, 1)))


class TestProjectPoints:
    def _intrinsics(self):
        K = np.eye(4, dtype=np.float32)
        K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 100.0, 100.0, 50.0, 40.0
        return jnp.asarray(K)

    def test_pinhole(self):
        K = self._intrinsics()
        pts = jnp.array([[0.0, 0.0, 1.0], [0.1, -0.2, 2.0]])
        uv = project_points(pts, K)
        np.testing.assert_allclose(
            uv, [[50.0, 40.0], [55.0, 30.0]], rtol=1e-5
        )

    def test_zero_depth_guard(self):
        K = self._intrinsics()
        uv = project_points(jnp.array([[0.5, 0.5, 0.0]]), K)
        assert bool(jnp.all(jnp.isfinite(uv)))

    def test_batched_proj_mats(self):
        # reference case 3 (projutils.py docstring): one proj_mat per batch
        # element broadcasts over the points dim
        K = jnp.broadcast_to(self._intrinsics(), (2, 4, 4))
        pts = jnp.asarray(
            np.random.RandomState(1).rand(2, 6, 3).astype(np.float32) + 1.0
        )
        uv = project_points(pts, K)
        assert uv.shape == (2, 6, 2)
        single = project_points(pts[0], K[0])
        np.testing.assert_allclose(np.asarray(uv[0]), np.asarray(single), rtol=1e-6)


class TestUnprojectProjectRoundtrip:
    def test_roundtrip(self):
        K = np.eye(4, dtype=np.float32)
        K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 80.0, 90.0, 30.0, 20.0
        K = jnp.asarray(K)
        Kinv = inverse_intrinsics(K)
        rng = np.random.RandomState(2)
        uv = jnp.asarray(rng.rand(50, 2).astype(np.float32) * 60)
        depth = jnp.asarray(rng.rand(50).astype(np.float32) + 0.5)
        pts = unproject_points(uv, Kinv, depth)
        uv2 = project_points(pts, K)
        np.testing.assert_allclose(uv2, uv, rtol=1e-3, atol=1e-3)


class TestInverseIntrinsics:
    def test_analytic_inverse(self):
        K = np.eye(4, dtype=np.float32)
        K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 525.0, 525.0, 319.5, 239.5
        Kinv = np.asarray(inverse_intrinsics(jnp.asarray(K)))
        expect = np.linalg.inv(K)
        np.testing.assert_allclose(Kinv, expect, rtol=1e-3, atol=1e-4)

    def test_3x3(self):
        K = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]], dtype=np.float32)
        Kinv = inverse_intrinsics(jnp.asarray(K))
        assert Kinv.shape == (3, 3)
        np.testing.assert_allclose(
            np.asarray(Kinv) @ K, np.eye(3), rtol=1e-3, atol=1e-4
        )

    def test_batched(self):
        K = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1, 1))
        K[..., 0, 0] = 100.0
        K[..., 1, 1] = 200.0
        out = inverse_intrinsics(jnp.asarray(K))
        assert out.shape == (2, 1, 4, 4)

    def test_raises(self):
        with pytest.raises(ValueError):
            inverse_intrinsics(jnp.ones((4, 2)))
