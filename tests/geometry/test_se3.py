import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.geometry import (
    se3_exp,
    se3_hat,
    se3_log,
    so3_exp,
    so3_hat,
    transform_pointcloud,
)


class TestHats:
    def test_so3_hat_skew(self):
        w = jnp.array([1.0, 2.0, 3.0])
        h = np.asarray(so3_hat(w))
        np.testing.assert_allclose(h, -h.T)
        np.testing.assert_allclose(h[0, 1], -3.0)
        np.testing.assert_allclose(h[2, 0], -2.0)
        np.testing.assert_allclose(h[1, 2], -1.0)

    def test_so3_hat_batched(self):
        w = jnp.ones((5, 2, 3))
        assert so3_hat(w).shape == (5, 2, 3, 3)

    def test_se3_hat(self):
        xi = jnp.array([1.0, 2.0, 3.0, 0.1, 0.2, 0.3])
        h = np.asarray(se3_hat(xi))
        np.testing.assert_allclose(h[:3, 3], [1.0, 2.0, 3.0])
        np.testing.assert_allclose(h[3], 0.0)


class TestExp:
    def test_so3_exp_identity(self):
        R = so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)

    def test_so3_exp_orthogonal(self):
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(10, 3).astype(np.float32))
        R = np.asarray(so3_exp(w))
        for r in R:
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
            np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)

    def test_so3_exp_known_rotation(self):
        # pi/2 about z
        R = np.asarray(so3_exp(jnp.array([0.0, 0.0, np.pi / 2])))
        np.testing.assert_allclose(
            R, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6
        )

    def test_se3_exp_identity(self):
        T = se3_exp(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)

    def test_se3_exp_pure_translation(self):
        T = np.asarray(se3_exp(jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])))
        # Small-angle branch: V = I + hat(0) = I -> t = v
        np.testing.assert_allclose(T[:3, 3], [1.0, 2.0, 3.0], atol=1e-6)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)

    def test_se3_exp_batched_matches_single(self):
        rng = np.random.RandomState(1)
        xi = jnp.asarray(rng.randn(8, 6).astype(np.float32) * 0.3)
        batched = np.asarray(se3_exp(xi))
        singles = np.stack([np.asarray(se3_exp(x)) for x in xi])
        np.testing.assert_allclose(batched, singles, atol=1e-6)

    def test_se3_exp_jit_grad(self):
        # the exp map must be differentiable through jit (gradLM requirement)
        def loss(xi):
            T = se3_exp(xi)
            pts = jnp.ones((5, 3))
            return jnp.sum(transform_pointcloud(pts, T) ** 2)

        g = jax.jit(jax.grad(loss))(jnp.zeros(6))
        assert g.shape == (6,)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_grad_at_zero_is_finite(self):
        # where-guarded small-angle branch must not produce NaN grads at 0
        g = jax.grad(lambda w: jnp.sum(so3_exp(w)))(jnp.zeros(3))
        assert bool(jnp.all(jnp.isfinite(g)))


class TestLog:
    @pytest.mark.parametrize("scale", [1.0, 0.1, 0.01])
    def test_log_exp_roundtrip(self, scale):
        rng = np.random.RandomState(3)
        xi = jnp.asarray(rng.randn(6, 6).astype(np.float32) * scale)
        T = se3_exp(xi)
        xi2 = se3_log(T)
        T2 = se3_exp(xi2)
        np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-4)
