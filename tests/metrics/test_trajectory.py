import jax.numpy as jnp
import numpy as np

from gradslam_tpu.geometry import se3_exp
from gradslam_tpu.metrics import ate_rmse, rpe, umeyama_alignment


def random_trajectory(rng, L=20, scale=0.1):
    poses = [np.eye(4, dtype=np.float32)]
    for _ in range(L - 1):
        xi = rng.randn(6).astype(np.float32) * scale
        step = np.asarray(se3_exp(jnp.asarray(xi)))
        poses.append(poses[-1] @ step)
    return jnp.asarray(np.stack(poses))


class TestUmeyama:
    def test_recovers_rigid_transform(self):
        rng = np.random.RandomState(0)
        src = jnp.asarray(rng.randn(30, 3).astype(np.float32))
        xi = jnp.asarray([0.3, -0.2, 0.5, 0.4, 0.1, -0.3], jnp.float32)
        T = np.asarray(se3_exp(xi))
        dst = jnp.asarray(np.asarray(src) @ T[:3, :3].T + T[:3, 3])
        R, t, s = umeyama_alignment(src, dst)
        np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), T[:3, 3], atol=1e-4)
        np.testing.assert_allclose(float(s), 1.0, atol=1e-5)

    def test_with_scale(self):
        rng = np.random.RandomState(1)
        src = jnp.asarray(rng.randn(30, 3).astype(np.float32))
        dst = src * 2.5
        R, t, s = umeyama_alignment(src, dst, with_scale=True)
        np.testing.assert_allclose(float(s), 2.5, rtol=1e-4)


class TestATE:
    def test_zero_for_identical(self):
        rng = np.random.RandomState(2)
        traj = random_trajectory(rng)
        assert float(ate_rmse(traj, traj)) < 1e-6

    def test_invariant_to_rigid_offset(self):
        rng = np.random.RandomState(3)
        traj = random_trajectory(rng)
        offset = np.asarray(se3_exp(jnp.asarray([1.0, 2.0, 3.0, 0.5, 0.2, 0.1])))
        moved = jnp.asarray(np.einsum("ij,ljk->lik", offset, np.asarray(traj)))
        assert float(ate_rmse(moved, traj, align=True)) < 1e-4

    def test_nonzero_for_noisy(self):
        rng = np.random.RandomState(4)
        traj = random_trajectory(rng)
        noisy = traj.at[..., :3, 3].add(
            jnp.asarray(rng.randn(*traj[..., :3, 3].shape).astype(np.float32) * 0.05)
        )
        e = float(ate_rmse(noisy, traj))
        assert 0.01 < e < 0.2

    def test_batched(self):
        rng = np.random.RandomState(5)
        t1 = random_trajectory(rng)
        t2 = random_trajectory(rng)
        out = ate_rmse(jnp.stack([t1, t2]), jnp.stack([t1, t2]))
        assert out.shape == (2,)


class TestRPE:
    def test_zero_for_identical(self):
        rng = np.random.RandomState(6)
        traj = random_trajectory(rng)
        t, r = rpe(traj, traj)
        assert float(t) < 1e-6 and float(r) < 1e-3

    def test_detects_drift(self):
        rng = np.random.RandomState(7)
        traj = random_trajectory(rng)
        drifted = np.asarray(traj).copy()
        for i in range(1, len(drifted)):
            drifted[i, :3, 3] += 0.01 * i
        t, r = rpe(jnp.asarray(drifted), traj)
        assert float(t) > 0.005
