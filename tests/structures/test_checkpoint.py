import jax.numpy as jnp
import pytest
import numpy as np

from gradslam_tpu.structures import append_to_map, init_map
from gradslam_tpu.utils import load_slam_state, save_slam_state


class TestCheckpoint:
    def test_npz_round_trip(self, tmp_path):
        m = init_map(2, 20)
        pts = jnp.asarray(np.random.RandomState(0).randn(2, 5, 3).astype(np.float32))
        mask = jnp.ones((2, 5), dtype=bool)
        m = append_to_map(m, pts, pts, pts, pts[..., :1], mask)
        poses = jnp.asarray(np.random.RandomState(1).randn(2, 3, 4, 4).astype(np.float32))

        path = tmp_path / "state.npz"
        save_slam_state(str(path), m, poses)
        m2, poses2 = load_slam_state(str(path))

        np.testing.assert_allclose(np.asarray(m2.points), np.asarray(m.points))
        np.testing.assert_array_equal(
            np.asarray(m2.num_points), np.asarray(m.num_points)
        )
        np.testing.assert_allclose(np.asarray(poses2), np.asarray(poses))

    def test_without_poses(self, tmp_path):
        m = init_map(1, 10)
        path = tmp_path / "state.npz"
        save_slam_state(str(path), m)
        m2, poses2 = load_slam_state(str(path))
        assert poses2 is None
        assert m2.capacity == 10

    def test_resume_continues_slam(self, tmp_path, msrd_data):
        """A resumed map produces identical results to an uninterrupted
        run — the checkpoint is the reference's step() resume surface."""
        from gradslam_tpu.slam import ICPSLAM
        from gradslam_tpu.structures import RGBDImages, init_map, map_to_pointclouds

        rgbd = RGBDImages(
            msrd_data["colors"],
            msrd_data["depths"],
            msrd_data["intrinsics"],
            msrd_data["poses"],
        )
        slam = ICPSLAM(odom="gt")
        B, L, H, W = rgbd.shape

        # uninterrupted
        m_full = init_map(B, L * H * W)
        pose = None
        for s in range(L):
            m_full, pose = slam.step(m_full, rgbd[:, s], pose)

        # interrupted + resumed after frame 1
        m = init_map(B, L * H * W)
        pose = None
        for s in range(2):
            m, pose = slam.step(m, rgbd[:, s], pose)
        save_slam_state(str(tmp_path / "ck.npz"), m, pose)
        m2, pose2 = load_slam_state(str(tmp_path / "ck.npz"))
        for s in range(2, L):
            m2, pose2 = slam.step(m2, rgbd[:, s], pose2)

        np.testing.assert_array_equal(
            np.asarray(m2.num_points), np.asarray(m_full.num_points)
        )
        np.testing.assert_allclose(
            np.asarray(m2.points), np.asarray(m_full.points), atol=1e-6
        )

    def test_orbax_round_trip(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        m = init_map(1, 8)
        pts = jnp.ones((1, 3, 3))
        m = append_to_map(
            m, pts, pts, pts, jnp.ones((1, 3, 1)), jnp.ones((1, 3), bool)
        )
        poses = jnp.zeros((1, 2, 4, 4))
        path = tmp_path / "orbax_ckpt"
        save_slam_state(str(path), m, poses, use_orbax=True)
        m2, poses2 = load_slam_state(str(path), use_orbax=True)
        np.testing.assert_allclose(np.asarray(m2.data), np.asarray(m.data))
        np.testing.assert_array_equal(
            np.asarray(m2.num_points), np.asarray(m.num_points)
        )
        np.testing.assert_allclose(np.asarray(poses2), np.asarray(poses))


class TestPlyExport:
    def test_ply_round_trip_header(self, tmp_path, msrd_data):
        from gradslam_tpu.structures import RGBDImages
        from gradslam_tpu.structures.utils import pointclouds_from_rgbdimages
        from gradslam_tpu.viz import pointclouds_to_ply

        rgbd = RGBDImages(
            msrd_data["colors"][:1, :1],
            msrd_data["depths"][:1, :1],
            msrd_data["intrinsics"][:1],
            msrd_data["poses"][:1, :1],
        )
        pc = pointclouds_from_rgbdimages(rgbd)
        path = tmp_path / "map.ply"
        pointclouds_to_ply(pc, str(path))
        data = path.read_bytes()
        n = int(pc.num_points_per_pointcloud[0])
        header = data.split(b"end_header\n")[0].decode()
        assert f"element vertex {n}" in header
        assert "property float nx" in header
        assert "property uchar red" in header
        # payload size: n * (3+3 floats + 3 uchar)
        payload = data.split(b"end_header\n", 1)[1]
        assert len(payload) == n * (6 * 4 + 3)
