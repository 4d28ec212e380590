import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.parallel.seqpar import (
    chunk_sequence,
    merge_chunk_maps,
    sequence_parallel_slam,
)
from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence


@pytest.fixture(scope="module")
def seq(msrd_data):
    """Golden clip extended to 7 frames by cycling (B=1, HALF RESOLUTION
    — these are self-consistency tests against their own direct run, so
    resolution does not change what they prove; compile+run cost does)."""
    idx = [0, 1, 2, 1, 0, 1, 2]
    colors = jnp.asarray(msrd_data["colors"][:1, idx, ::2, ::2])
    depths = jnp.asarray(msrd_data["depths"][:1, idx, ::2, ::2])
    K = np.asarray(msrd_data["intrinsics"][:1]).copy()
    K[:, :, :2] /= 2
    return colors, depths, jnp.asarray(K)


OPTS = SLAMOptions(odom="gradicp", numiters=10, dsratio=4, fusion=True)


class TestChunking:
    def test_chunk_shapes_and_overlap(self):
        x = jnp.arange(10)[None, :, None] * jnp.ones((2, 1, 3))
        c = chunk_sequence(x, n_chunks=3, chunk_len=4)
        assert c.shape == (6, 4, 3)
        # stride 3: chunk boundaries share a frame
        np.testing.assert_allclose(np.asarray(c[0, -1]), np.asarray(c[1, 0]))
        np.testing.assert_allclose(np.asarray(c[1, -1]), np.asarray(c[2, 0]))

    def test_tail_padding_repeats_last(self):
        x = jnp.arange(5, dtype=jnp.float32)[None, :, None]
        c = chunk_sequence(x, n_chunks=3, chunk_len=3)
        # need = 2*2+3 = 7 > 5: frames 5,6 are repeats of frame 4
        np.testing.assert_allclose(np.asarray(c[2, -1]), 4.0)


class TestSequenceParallel:
    def test_single_chunk_matches_direct(self, seq):
        colors, depths, K = seq
        B, L, H, W, _ = colors.shape
        res = sequence_parallel_slam(colors, depths, K, OPTS, n_chunks=1)
        _, poses_direct = slam_sequence(
            colors, depths, K, None, OPTS, L * H * W
        )
        np.testing.assert_allclose(
            np.asarray(res.poses), np.asarray(poses_direct), atol=1e-5
        )

    def test_multi_chunk_close_to_direct(self, seq):
        colors, depths, K = seq
        B, L, H, W, _ = colors.shape
        res = sequence_parallel_slam(colors, depths, K, OPTS, n_chunks=3)
        assert res.poses.shape == (B, L, 4, 4)
        _, poses_direct = slam_sequence(
            colors, depths, K, None, OPTS, L * H * W
        )
        terr = np.linalg.norm(
            np.asarray(res.poses)[..., :3, 3]
            - np.asarray(poses_direct)[..., :3, 3],
            axis=-1,
        )
        assert terr.max() < 0.02, f"translation divergence {terr.max()}"

    def test_first_frame_identity(self, seq):
        colors, depths, K = seq
        res = sequence_parallel_slam(colors, depths, K, OPTS, n_chunks=2)
        np.testing.assert_allclose(
            np.asarray(res.poses[:, 0]),
            np.broadcast_to(np.eye(4), (1, 4, 4)),
            atol=1e-6,
        )

    def test_merge_chunk_maps(self, seq):
        colors, depths, K = seq
        res = sequence_parallel_slam(colors, depths, K, OPTS, n_chunks=2)
        pc = merge_chunk_maps(res, batch_size=1)
        n = int(pc.num_points_per_pointcloud[0])
        assert n > 1000
        pts = np.asarray(pc.points_padded[0, :n])
        assert np.isfinite(pts).all()

    def test_merge_chunk_maps_voxel_dedup(self, seq):
        colors, depths, K = seq
        res = sequence_parallel_slam(colors, depths, K, OPTS, n_chunks=2)
        pc_raw = merge_chunk_maps(res, batch_size=1)
        pc_dd = merge_chunk_maps(res, batch_size=1, dedup_voxel=0.05)
        n_raw = int(pc_raw.num_points_per_pointcloud[0])
        n_dd = int(pc_dd.num_points_per_pointcloud[0])
        # seam-overlap duplicates collapse: strictly fewer points
        assert 0 < n_dd < n_raw
        pts = np.asarray(pc_dd.points_padded[0, :n_dd])
        assert np.isfinite(pts).all()
        # confidence is conserved: total ccount unchanged by merging
        cc_raw = np.asarray(pc_raw.features_padded[0, :n_raw]).sum()
        cc_dd = np.asarray(pc_dd.features_padded[0, :n_dd]).sum()
        np.testing.assert_allclose(cc_dd, cc_raw, rtol=1e-4)

    def test_refine_keeps_consistent_trajectory(self, seq):
        colors, depths, K = seq
        res = sequence_parallel_slam(
            colors, depths, K, OPTS, n_chunks=2, refine=True, refine_iters=3
        )
        res0 = sequence_parallel_slam(colors, depths, K, OPTS, n_chunks=2)
        # odometry-only edges: refinement should stay near the stitched
        # trajectory (it is already the optimum of the chain graph)
        terr = np.linalg.norm(
            np.asarray(res.poses)[..., :3, 3]
            - np.asarray(res0.poses)[..., :3, 3],
            axis=-1,
        )
        assert terr.max() < 5e-3

    def test_sharded_over_mesh(self, seq):
        from gradslam_tpu.parallel import make_mesh

        if len(jax.devices()) < 4:
            pytest.skip("needs >=4 devices")
        colors, depths, K = seq
        mesh = make_mesh(data=4, map_=1, devices=jax.devices()[:4])
        res = sequence_parallel_slam(
            colors, depths, K, OPTS, n_chunks=4, mesh=mesh
        )
        res_ref = sequence_parallel_slam(colors, depths, K, OPTS, n_chunks=4)
        np.testing.assert_allclose(
            np.asarray(res.poses), np.asarray(res_ref.poses), atol=1e-4
        )

    def test_gt_odometry_rejected(self, seq):
        colors, depths, K = seq
        with pytest.raises(ValueError):
            sequence_parallel_slam(
                colors, depths, K, SLAMOptions(odom="gt"), n_chunks=2
            )
