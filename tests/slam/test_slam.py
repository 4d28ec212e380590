import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.slam import ICPSLAM, PointFusion
from gradslam_tpu.structures import RGBDImages


@pytest.fixture
def rgbd(msrd_data):
    return RGBDImages(
        msrd_data["colors"],
        msrd_data["depths"],
        msrd_data["intrinsics"],
        msrd_data["poses"],
    )


class TestICPSLAMGt:
    def test_gt_odometry_returns_gt_poses(self, rgbd, msrd_data):
        slam = ICPSLAM(odom="gt")
        pc, poses = slam(rgbd)
        np.testing.assert_allclose(
            np.asarray(poses), msrd_data["poses"], atol=1e-6
        )

    def test_aggregate_map_counts(self, rgbd, msrd_data):
        slam = ICPSLAM(odom="gt")
        pc, poses = slam(rgbd)
        valid = (msrd_data["depths"] > 0)[..., 0].sum((1, 2, 3))
        np.testing.assert_array_equal(
            np.asarray(pc.num_points_per_pointcloud), valid
        )


class TestPointFusionGt:
    def test_map_smaller_than_aggregate(self, rgbd):
        agg, _ = ICPSLAM(odom="gt")(rgbd)
        fus, _ = PointFusion(odom="gt")(rgbd)
        n_agg = np.asarray(agg.num_points_per_pointcloud)
        n_fus = np.asarray(fus.num_points_per_pointcloud)
        assert (n_fus < n_agg).all()
        assert (n_fus > 0).all()

    def test_map_has_valid_attributes(self, rgbd):
        pc, _ = PointFusion(odom="gt")(rgbd)
        n = int(pc.num_points_per_pointcloud[0])
        pts = np.asarray(pc.points_padded[0, :n])
        cc = np.asarray(pc.features_padded[0, :n, 0])
        assert np.isfinite(pts).all()
        assert (cc > 0).all()


class TestOdometrySLAM:
    @pytest.mark.parametrize("odom", ["gradicp", "icp"])
    def test_recovered_trajectory_close_to_gt(self, rgbd, msrd_data, odom):
        """Frame-to-frame motion in the golden clip is small; ICP odometry
        started from GT frame 0 must stay close to the GT trajectory
        (analogue of the reference's synthetic-recovery oracle)."""
        slam = PointFusion(odom=odom, numiters=10)
        pc, poses = slam(rgbd)
        gt = msrd_data["poses"]
        # translation error per frame
        terr = np.linalg.norm(
            np.asarray(poses)[..., :3, 3] - gt[..., :3, 3], axis=-1
        )
        assert terr.max() < 0.02, f"translation error {terr.max()}"
        # rotation error: trace of relative rotation
        R = np.asarray(poses)[..., :3, :3]
        Rg = gt[..., :3, :3]
        cos = (np.einsum("blij,blij->bl", R, Rg) - 1.0) / 2.0
        ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        assert ang.max() < 2.0, f"rotation error {ang.max()} deg"

    def test_no_poses_starts_identity(self, msrd_data):
        rgbd = RGBDImages(
            msrd_data["colors"],
            msrd_data["depths"],
            msrd_data["intrinsics"],
        )
        slam = PointFusion(odom="gradicp", numiters=5)
        pc, poses = slam(rgbd)
        np.testing.assert_allclose(
            np.asarray(poses[:, 0]),
            np.broadcast_to(np.eye(4), (2, 4, 4)),
            atol=1e-6,
        )

    def test_aggregate_recent_targets_accuracy(self, msrd_data):
        """odom_targets='recent' (aggregate mapping, odometry against the
        previous frame's appended cloud — bounded cost) must track the GT
        trajectory as well as the full-map association on the golden
        clip."""
        from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence

        colors = jnp.asarray(msrd_data["colors"])
        depths = jnp.asarray(msrd_data["depths"])
        K = jnp.asarray(msrd_data["intrinsics"])
        gt = msrd_data["poses"]
        B, L, H, W = colors.shape[:4]
        for tgt in ("map", "recent"):
            opts = SLAMOptions(
                odom="gradicp", numiters=10, dsratio=4, fusion=False,
                odom_targets=tgt,
            )
            _, poses = slam_sequence(colors, depths, K, None, opts, L * H * W)
            terr = np.linalg.norm(
                np.asarray(poses)[..., :3, 3] - gt[..., :3, 3], axis=-1
            )
            assert terr.max() < 0.02, f"{tgt}: translation {terr.max()}"


class TestProjectiveAssociation:
    """Projective-association odometry (assoc='projective'): the TPU-first
    O(S) alternative to KNN association (net-new vs the reference)."""

    @pytest.mark.parametrize("odom", ["gradicp", "icp"])
    def test_trajectory_close_to_gt(self, rgbd, msrd_data, odom):
        """Projective association must recover the golden trajectory to the
        same tolerance as the KNN path (small-motion clip)."""
        slam = PointFusion(odom=odom, numiters=10, assoc="projective")
        pc, poses = slam(rgbd)
        gt = msrd_data["poses"]
        terr = np.linalg.norm(
            np.asarray(poses)[..., :3, 3] - gt[..., :3, 3], axis=-1
        )
        assert terr.max() < 0.02, f"translation error {terr.max()}"
        R = np.asarray(poses)[..., :3, :3]
        Rg = gt[..., :3, :3]
        cos = (np.einsum("blij,blij->bl", R, Rg) - 1.0) / 2.0
        ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        assert ang.max() < 2.0, f"rotation error {ang.max()} deg"

    def test_state_api_matches_sequence(self, rgbd):
        """The carried model image advances identically through the state
        API and the fused scan."""
        slam = PointFusion(odom="gradicp", numiters=6, assoc="projective")
        B, L, H, W = rgbd.shape
        state = slam.init_state(rgbd[:, 0], capacity=L * H * W)
        poses_inc = [np.asarray(state.pose)]
        for s in range(1, L):
            state = slam.step_state(state, rgbd[:, s])
            poses_inc.append(np.asarray(state.pose))
        _, poses_fwd = slam(rgbd)
        np.testing.assert_allclose(
            np.stack(poses_inc, axis=1), np.asarray(poses_fwd), atol=1e-6
        )

    def test_requires_fusion(self):
        with pytest.raises(ValueError, match="projective"):
            ICPSLAM(odom="gradicp", assoc="projective")

    def test_slam_step_rejects_projective(self, msrd_data):
        from gradslam_tpu.slam.icpslam import SLAMOptions, slam_step
        from gradslam_tpu.structures.maparena import init_map

        opts = SLAMOptions(odom="gradicp", fusion=True, assoc="projective")
        m = init_map(1, 1024)
        with pytest.raises(ValueError, match="model image"):
            slam_step(
                m,
                jnp.broadcast_to(jnp.eye(4), (1, 4, 4)),
                jnp.zeros((1, 8, 8, 3)),
                jnp.ones((1, 8, 8, 1)),
                jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4)),
                opts,
            )


class TestAssocWindowOdometry:
    """The capacity-windowed association as the ODOMETRY target set
    (fusion mapping only — in aggregate mapping the arena prefix is
    append history, not a working set)."""

    def test_windowed_odometry_matches_full_arena(self, rgbd, msrd_data):
        """Fusion + real odometry + cand=None (reuse_actives=False) is the
        one path where assoc_window gates the odometry targets in
        _localize; on the golden clip every live row fits the window, so
        the trajectory must match the exact full-arena program."""
        out = {}
        for aw in (0, 2 * 120 * 160):
            slam = PointFusion(
                odom="gradicp", numiters=10, assoc_window=aw,
                reuse_actives=False,
            )
            _, poses = slam(rgbd)
            out[aw] = np.asarray(poses)
        np.testing.assert_allclose(
            out[0], out[2 * 120 * 160], rtol=1e-5, atol=1e-6
        )
        terr = np.linalg.norm(
            out[2 * 120 * 160][..., :3, 3] - msrd_data["poses"][..., :3, 3],
            axis=-1,
        )
        assert terr.max() < 0.02

    def test_aggregate_rejects_assoc_window(self):
        with pytest.raises(ValueError, match="assoc_window"):
            ICPSLAM(odom="gradicp", assoc_window=4096)

    def test_rejects_bad_model_rows(self):
        with pytest.raises(ValueError, match="model_rows"):
            PointFusion(odom="gradicp", model_rows="bogus")
        PointFusion(odom="gradicp", model_rows="dense")
        PointFusion(odom="gradicp", model_rows="gather")

    def test_rejects_bad_window_merge(self):
        with pytest.raises(ValueError, match="window_merge"):
            PointFusion(odom="gradicp", window_merge="bogus")
        PointFusion(odom="gradicp", window_merge="rows")

    def test_rejects_assoc_window_with_block_size(self):
        with pytest.raises(ValueError, match="mutually exclusive"):
            PointFusion(
                odom="gradicp", assoc_window=4096, block_size=1024
            )

    def test_rejects_explicit_merge_window_with_assoc_window(self):
        with pytest.raises(ValueError, match="merge_window"):
            PointFusion(
                odom="gradicp", assoc_window=4096, merge_window=8192
            )
        # auto (-1) and off (0) remain fine
        PointFusion(odom="gradicp", assoc_window=4096, merge_window=-1)
        PointFusion(odom="gradicp", assoc_window=4096, merge_window=0)

    def test_aggregate_options_ignore_window(self, msrd_data):
        """SLAMOptions users can still hand-build fusion=False +
        assoc_window (ICPSLAM rejects it); the odometry window must then
        be IGNORED — a tiny window would otherwise pin the targets to
        the oldest appended rows and visibly bend the trajectory."""
        from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence

        colors = jnp.asarray(msrd_data["colors"])
        depths = jnp.asarray(msrd_data["depths"])
        K = jnp.asarray(msrd_data["intrinsics"])
        B, L, H, W = colors.shape[:4]
        out = {}
        for aw in (0, (H * W) // 8):
            opts = SLAMOptions(
                odom="gradicp", numiters=5, fusion=False, assoc_window=aw
            )
            _, poses = slam_sequence(colors, depths, K, None, opts, L * H * W)
            out[aw] = np.asarray(poses)
        np.testing.assert_array_equal(out[0], out[(H * W) // 8])

    def test_fusion_rejects_recent_targets(self):
        with pytest.raises(ValueError, match="recent"):
            PointFusion(odom="gradicp", odom_targets="recent")

    def test_slam_step_rejects_recent_targets(self):
        from gradslam_tpu.slam.icpslam import SLAMOptions, slam_step
        from gradslam_tpu.structures.maparena import init_map

        opts = SLAMOptions(
            odom="gradicp", fusion=False, odom_targets="recent"
        )
        m = init_map(1, 1024)
        with pytest.raises(ValueError, match="stateful API"):
            slam_step(
                m,
                jnp.broadcast_to(jnp.eye(4), (1, 4, 4)),
                jnp.zeros((1, 8, 8, 3)),
                jnp.ones((1, 8, 8, 1)),
                jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4)),
                opts,
            )


class TestIncrementalStep:
    def test_step_matches_forward(self, rgbd, msrd_data):
        from gradslam_tpu.structures import init_map, map_to_pointclouds

        slam = ICPSLAM(odom="gt")
        B, L, H, W = rgbd.shape
        m = init_map(B, L * H * W)
        pose = None
        for s in range(L):
            m, pose = slam.step(m, rgbd[:, s], pose)
        pc_inc = map_to_pointclouds(m)
        pc_fwd, _ = slam(rgbd)
        np.testing.assert_array_equal(
            np.asarray(pc_inc.num_points_per_pointcloud),
            np.asarray(pc_fwd.num_points_per_pointcloud),
        )
        n = int(pc_inc.num_points_per_pointcloud[0])
        np.testing.assert_allclose(
            np.asarray(pc_inc.points_padded[0, :n]),
            np.asarray(pc_fwd.points_padded[0, :n]),
            atol=1e-6,
        )

    def test_state_api_matches_sequence(self, rgbd, msrd_data):
        """SLAMState incremental stepping == slam_sequence, bit for bit
        (it IS the scan body), including the carried odometry candidates."""
        from gradslam_tpu import PointFusion
        from gradslam_tpu.structures import map_to_pointclouds

        slam = PointFusion(odom="gradicp", numiters=6)
        B, L, H, W = rgbd.shape
        state = slam.init_state(rgbd[:, 0], capacity=L * H * W)
        poses_inc = [np.asarray(state.pose)]
        for s in range(1, L):
            state = slam.step_state(state, rgbd[:, s])
            poses_inc.append(np.asarray(state.pose))
        pc_fwd, poses_fwd = slam(rgbd)
        np.testing.assert_allclose(
            np.stack(poses_inc, axis=1), np.asarray(poses_fwd), atol=1e-6
        )
        pc_inc = map_to_pointclouds(state.map_state)
        np.testing.assert_array_equal(
            np.asarray(pc_inc.num_points_per_pointcloud),
            np.asarray(pc_fwd.num_points_per_pointcloud),
        )
        n = int(pc_inc.num_points_per_pointcloud[0])
        np.testing.assert_allclose(
            np.asarray(pc_inc.points_padded[0, :n]),
            np.asarray(pc_fwd.points_padded[0, :n]),
            atol=1e-6,
        )

    def test_state_api_aggregate_and_gt(self, rgbd, msrd_data):
        """The state API covers aggregate mapping and gt odometry too."""
        slam = ICPSLAM(odom="gt")
        B, L, H, W = rgbd.shape
        state = slam.init_state(rgbd[:, 0], capacity=L * H * W)
        for s in range(1, L):
            state = slam.step_state(state, rgbd[:, s])
        _, poses_fwd = slam(rgbd)
        np.testing.assert_allclose(
            np.asarray(state.pose), np.asarray(poses_fwd[:, -1]), atol=1e-6
        )


class TestDifferentiability:
    def test_grad_through_full_slam(self, msrd_data):
        """End-to-end gradients: a loss on the recovered trajectory
        differentiates back to the raw depth maps (BASELINE configs[5])."""
        from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence

        colors = jnp.asarray(msrd_data["colors"][:1, :2, ::4, ::4])
        depths = jnp.asarray(msrd_data["depths"][:1, :2, ::4, ::4])
        K = jnp.asarray(msrd_data["intrinsics"][:1]).at[:, :, :2].mul(0.25)
        opts = SLAMOptions(odom="gradicp", numiters=3, fusion=True, dsratio=2)
        cap = 2 * depths.shape[2] * depths.shape[3]

        def loss(d):
            _, poses = slam_sequence(colors, d, K, None, opts, cap)
            return jnp.sum(poses[:, 1, :3, 3] ** 2)

        g = jax.grad(loss)(depths)
        assert g.shape == depths.shape
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.max(jnp.abs(g))) > 0


class TestPyramidOdometry:
    def test_pyramid_recovers_larger_motion(self, msrd_data):
        """Coarse-to-fine odometry handles a synthetically enlarged motion
        that degrades the single-level solve."""
        from gradslam_tpu.geometry import se3_exp, transform_pointcloud
        from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence

        colors = jnp.asarray(msrd_data["colors"][:1, :2])
        depths = jnp.asarray(msrd_data["depths"][:1, :2])
        K = jnp.asarray(msrd_data["intrinsics"][:1])
        B, L, H, W, _ = colors.shape
        cap = L * H * W
        gt = msrd_data["poses"][:1, :2]

        single = SLAMOptions(odom="gradicp", numiters=10, dsratio=4, fusion=True)
        pyr = single._replace(pyramid=(8, 4), numiters=5)
        _, p1 = slam_sequence(colors, depths, K, None, single, cap)
        _, p2 = slam_sequence(colors, depths, K, None, pyr, cap)
        # both must be accurate on the golden clip's small motion
        for p in (p1, p2):
            terr = np.linalg.norm(
                np.asarray(p)[..., :3, 3] - gt[..., :3, 3], axis=-1
            )
            assert terr.max() < 0.01

    def test_pyramid_option_accepted_by_class(self, rgbd):
        slam = PointFusion(odom="gradicp", numiters=5, pyramid=(8, 4))
        pc, poses = slam(rgbd)
        assert poses.shape[1] == 3


class TestOddShapes:
    """Robustness at awkward sizes (nothing aligned to tiles/blocks)."""

    @pytest.mark.parametrize("B,L,H,W", [(1, 1, 37, 53), (3, 2, 30, 41)])
    def test_slam_sequence_odd_shapes(self, B, L, H, W):
        from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence

        rng = np.random.RandomState(0)
        rgb = jnp.asarray(rng.rand(B, L, H, W, 3).astype(np.float32))
        base = 1.0 + 0.3 * rng.rand(H, W).astype(np.float32)
        depth = jnp.asarray(
            np.broadcast_to(base, (B, L, H, W)).copy()[..., None]
        )
        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 40.0
        K[0, 2], K[1, 2] = W / 2, H / 2
        K = jnp.asarray(np.broadcast_to(K, (B, 1, 4, 4)).copy())
        opts = SLAMOptions(odom="gradicp", numiters=3, fusion=True, dsratio=3)
        m, poses = slam_sequence(rgb, depth, K, None, opts, L * H * W)
        assert poses.shape == (B, L, 4, 4)
        assert np.isfinite(np.asarray(poses)).all()
        assert (np.asarray(m.num_points) > 0).all()

    def test_block_gating_odd_shapes(self):
        from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence

        rng = np.random.RandomState(1)
        B, L, H, W = 1, 2, 45, 61
        rgb = jnp.asarray(rng.rand(B, L, H, W, 3).astype(np.float32))
        depth = jnp.asarray(
            (1.0 + 0.2 * rng.rand(B, L, H, W).astype(np.float32))[..., None]
        )
        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 50.0
        K[0, 2], K[1, 2] = W / 2, H / 2
        K = jnp.asarray(K[None, None])
        opts = SLAMOptions(
            odom="gradicp", numiters=2, fusion=True, dsratio=2,
            block_size=700,  # does not divide the capacity
        )
        m, poses = slam_sequence(rgb, depth, K, None, opts, L * H * W)
        assert np.isfinite(np.asarray(poses)).all()
