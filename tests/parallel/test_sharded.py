import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.parallel import DepthCalibParams, make_mesh
from gradslam_tpu.parallel.sharded import sharded_slam, sharded_train_step
from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence


@pytest.fixture(scope="module")
def batch8(msrd_data):
    """B=8 sequence batch (tiled from the golden clip) for a (data=4) mesh."""
    reps = [0, 1] * 4
    colors = jnp.asarray(msrd_data["colors"][reps, :, ::2, ::2])
    depths = jnp.asarray(msrd_data["depths"][reps, :, ::2, ::2])
    K = jnp.asarray(msrd_data["intrinsics"][reps]).at[:, :, :2].mul(0.5)
    poses = jnp.asarray(msrd_data["poses"][reps])
    return colors, depths, K, poses


OPTS = SLAMOptions(odom="gradicp", numiters=5, fusion=True)


class TestShardedSLAM:
    def test_data_map_sharded_matches_unsharded(self, batch8):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        colors, depths, K, _ = batch8
        B, L, H, W, _ = colors.shape
        cap = L * H * W
        mesh = make_mesh(data=4, map_=2)

        m_ref, p_ref = slam_sequence(colors, depths, K, None, OPTS, cap)
        m_sh, p_sh = sharded_slam(mesh, colors, depths, K, None, OPTS, cap)
        np.testing.assert_allclose(
            np.asarray(p_sh), np.asarray(p_ref), atol=1e-4
        )
        np.testing.assert_array_equal(
            np.asarray(m_sh.num_points), np.asarray(m_ref.num_points)
        )
        # the arena must actually be PARTITIONED over the mesh — batch
        # over 'data' AND capacity over 'map' (not silently replicated)
        from jax.sharding import NamedSharding, PartitionSpec as P

        want = NamedSharding(mesh, P("data", "map"))
        assert m_sh.data.sharding.is_equivalent_to(want, m_sh.data.ndim), (
            m_sh.data.sharding
        )
        # per-device shard is 1/8th of the arena
        shard_shapes = {
            s.data.shape for s in m_sh.data.addressable_shards
        }
        assert shard_shapes == {(B // 4, cap // 2, m_sh.data.shape[-1])}
        np.testing.assert_allclose(
            np.asarray(m_sh.data), np.asarray(m_ref.data), atol=1e-4
        )

    def test_flagship_config_sharded_matches_unsharded(self, batch8):
        """The HEADLINE configuration (projective assoc + assoc_window +
        dense window merge + gated compaction) under a (data, map) mesh:
        GSPMD must partition the windowed slice / sorted-space scatters /
        dense merge correctly. Round-5 coverage — the plain-opts test
        above never traces these code paths."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        colors, depths, K, _ = batch8
        B, L, H, W, _ = colors.shape
        cap = L * H * W
        mesh = make_mesh(data=4, map_=2)
        opts = SLAMOptions(
            odom="gradicp", numiters=5, fusion=True, assoc="projective",
            assoc_window=2 * H * W,
        )
        m_ref, p_ref = slam_sequence(colors, depths, K, None, opts, cap)
        m_sh, p_sh = sharded_slam(mesh, colors, depths, K, None, opts, cap)
        np.testing.assert_allclose(
            np.asarray(p_sh), np.asarray(p_ref), atol=1e-4
        )
        np.testing.assert_array_equal(
            np.asarray(m_sh.num_points), np.asarray(m_ref.num_points)
        )
        np.testing.assert_allclose(
            np.asarray(m_sh.data), np.asarray(m_ref.data), atol=1e-4
        )

    def test_train_step_runs_on_mesh(self, batch8):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        colors, depths, K, poses = batch8
        B, L, H, W, _ = colors.shape
        mesh = make_mesh(data=4, map_=2)
        step = sharded_train_step(mesh, OPTS, L * H * W, lr=1e-3)
        params, loss = step(
            DepthCalibParams.init(), colors, depths, K, poses
        )
        assert np.isfinite(float(loss))
        assert np.isfinite(float(params.scale))
