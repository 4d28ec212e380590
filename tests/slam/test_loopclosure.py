"""Loop closure: synthetic drifted loop is detected, verified, corrected."""

import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.geometry import se3_exp
from gradslam_tpu.slam import (
    close_loops,
    detect_loop_closures,
    verify_loop_closures,
)


def _make_loop(L=9, n_pts=256, drift=0.02, seed=0):
    """Camera orbits a point cloud and returns to (near) the start.

    Returns (true_poses, drifted_poses, frame_points, frame_normals,
    frame_valid) — per-frame CAMERA-frame observations of a fixed world
    cloud, with odometry drift accumulated into the pose estimates.
    """
    rng = np.random.RandomState(seed)
    world = rng.uniform(-1.0, 1.0, (n_pts, 3)).astype(np.float32)
    world[:, 2] += 4.0  # in front of the ring of cameras
    normals = rng.randn(n_pts, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)

    true_poses, frames, frame_normals = [], [], []
    for k in range(L):
        # small circular trajectory; last frame returns near the first
        ang = 2 * np.pi * k / (L - 1)
        t = 0.15 * np.array([np.cos(ang) - 1.0, np.sin(ang), 0.0])
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = t
        true_poses.append(T)
        Tinv = np.linalg.inv(T)
        frames.append(world @ Tinv[:3, :3].T + Tinv[:3, 3])
        frame_normals.append(normals @ Tinv[:3, :3].T)
    true_poses = np.stack(true_poses)

    # drifted trajectory: perturb each odometry increment, accumulate
    drifted = [true_poses[0]]
    for k in range(1, L):
        inc = np.linalg.inv(true_poses[k - 1]) @ true_poses[k]
        xi = rng.randn(6).astype(np.float32) * drift
        noisy = np.asarray(se3_exp(jnp.asarray(xi))) @ inc
        drifted.append(drifted[-1] @ noisy)
    drifted = np.stack(drifted).astype(np.float32)

    return (
        jnp.asarray(true_poses),
        jnp.asarray(drifted),
        jnp.asarray(np.stack(frames)),
        jnp.asarray(np.stack(frame_normals)),
        jnp.ones((L, n_pts), bool),
    )


def _pose_err(a, b):
    return float(
        jnp.linalg.norm(a[..., :3, 3] - b[..., :3, 3], axis=-1).max()
    )


class TestDetect:
    def test_finds_the_loop_pair(self):
        true_poses, drifted, *_ = _make_loop()
        cand = detect_loop_closures(
            drifted, max_candidates=4, min_separation=5, max_distance=0.3
        )
        got = np.asarray(cand.edges)[np.asarray(cand.valid)]
        assert len(got) >= 1
        # the closing pair (0, L-1) must be among the candidates
        assert any((i == 0 and j == 8) for i, j in got)

    def test_min_separation_excludes_neighbors(self):
        _, drifted, *_ = _make_loop()
        cand = detect_loop_closures(
            drifted, max_candidates=8, min_separation=5, max_distance=10.0
        )
        got = np.asarray(cand.edges)[np.asarray(cand.valid)]
        assert (got[:, 1] - got[:, 0] >= 5).all()

    def test_no_candidates_on_straight_line(self):
        L = 8
        poses = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
        poses[:, 0, 3] = np.arange(L)  # walking away, never returns
        cand = detect_loop_closures(
            jnp.asarray(poses), max_candidates=4, min_separation=3,
            max_distance=0.5,
        )
        assert not bool(cand.valid.any())


class TestVerifyAndClose:
    def test_verification_recovers_relative_pose(self):
        true_poses, drifted, pts, nrm, valid = _make_loop()
        cand = detect_loop_closures(
            drifted, max_candidates=4, min_separation=5, max_distance=0.3
        )
        Z, w = verify_loop_closures(cand, drifted, pts, nrm, valid)
        got = np.asarray(cand.edges)
        accepted = np.asarray(w) > 0
        assert accepted.any()
        # for each accepted pair the ICP measurement must match the TRUE
        # relative pose (clouds are exact views of the same world points)
        for k in np.nonzero(accepted)[0]:
            i, j = got[k]
            Z_true = np.linalg.inv(np.asarray(true_poses[i])) @ np.asarray(
                true_poses[j]
            )
            np.testing.assert_allclose(
                np.asarray(Z[k]), Z_true, atol=5e-3
            )

    def test_close_loops_reduces_drift(self):
        true_poses, drifted, pts, nrm, valid = _make_loop()
        err_before = _pose_err(drifted, true_poses)
        refined, cand, w = close_loops(
            drifted, pts, nrm, valid,
            max_candidates=4, min_separation=5, max_distance=0.3,
        )
        assert bool((w > 0).any()), "no loop edges accepted"
        err_after = _pose_err(refined, true_poses)
        assert err_after < 0.5 * err_before, (
            f"drift not reduced: {err_before:.4f} -> {err_after:.4f}"
        )

    def test_no_loops_is_a_near_noop(self):
        # straight-line trajectory: no candidates, chain graph already
        # optimal -> refined stays at the input
        L, n = 8, 128
        rng = np.random.RandomState(1)
        world = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        world[:, 2] += 4
        poses, pts, nrm = [], [], []
        for k in range(L):
            T = np.eye(4, dtype=np.float32)
            T[0, 3] = 0.1 * k
            poses.append(T)
            Tinv = np.linalg.inv(T)
            pts.append(world @ Tinv[:3, :3].T + Tinv[:3, 3])
            nrm.append(np.tile([0, 0, 1.0], (n, 1)).astype(np.float32))
        poses = jnp.asarray(np.stack(poses))
        refined, cand, w = close_loops(
            poses,
            jnp.asarray(np.stack(pts)),
            jnp.asarray(np.stack(nrm)),
            jnp.ones((L, n), bool),
            max_candidates=4, min_separation=3, max_distance=0.2,
        )
        assert not bool((w > 0).any())
        assert _pose_err(refined, poses) < 1e-4


class TestRGBDWrapper:
    def test_close_loops_rgbd_runs_on_slam_output(self):
        """End-to-end: golden clip -> slam_sequence -> close_loops_rgbd."""
        import pathlib

        from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence
        from gradslam_tpu.slam import close_loops_rgbd

        d = pathlib.Path(__file__).parents[1] / "data" / "msrd_b2s3"
        colors = jnp.asarray(np.load(d / "colors.npy").astype(np.float32))
        depths = jnp.asarray(np.load(d / "depths.npy").astype(np.float32))
        K = jnp.asarray(np.load(d / "intrinsics.npy").astype(np.float32))
        opts = SLAMOptions(odom="gradicp", numiters=8, fusion=True)
        B, L, H, W = colors.shape[:4]
        _, poses = slam_sequence(colors, depths, K, None, opts, L * H * W)
        refined = close_loops_rgbd(
            colors, depths, K, poses,
            min_separation=2, max_distance=0.5, max_candidates=2,
        )
        assert refined.shape == poses.shape
        # the golden clip barely moves: refinement stays near the input
        # (loop edges, if any, agree with odometry)
        terr = np.linalg.norm(
            np.asarray(refined)[..., :3, 3] - np.asarray(poses)[..., :3, 3],
            axis=-1,
        )
        assert terr.max() < 0.02
        assert np.isfinite(np.asarray(refined)).all()


class TestAppearanceDetection:
    """Drift so large that pose-proximity detection fails; the
    pose-independent descriptor stage still finds the revisit."""

    @staticmethod
    def _make_drifted_loop(L=9, n_pts=256, H=48, W=64, seed=2):
        rng = np.random.RandomState(seed)
        world = rng.uniform(-1.0, 1.0, (n_pts, 3)).astype(np.float32)
        world[:, 2] += 4.0
        normals = rng.randn(n_pts, 3).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)

        true_poses, frames, frame_normals, depth_imgs = [], [], [], []
        yy, xx = np.meshgrid(
            np.linspace(0, 1, H, dtype=np.float32),
            np.linspace(0, 1, W, dtype=np.float32),
            indexing="ij",
        )
        for k in range(L):
            ang = 2 * np.pi * k / (L - 1)  # frame L-1 revisits frame 0
            t = 0.15 * np.array([np.cos(ang) - 1.0, np.sin(ang), 0.0])
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = t
            true_poses.append(T)
            Tinv = np.linalg.inv(T)
            frames.append(world @ Tinv[:3, :3].T + Tinv[:3, 3])
            frame_normals.append(normals @ Tinv[:3, :3].T)
            # view-dependent synthetic depth image, periodic in ang:
            # frames 0 and L-1 see the identical image, intermediate
            # frames see different ones
            depth_imgs.append(
                2.0
                + 0.6 * np.sin(5 * xx + ang) * np.cos(4 * yy + ang)
                + 0.3 * np.sin(2 * yy + 2 * ang)
            )
        true_poses = np.stack(true_poses)
        depth_imgs = np.stack(depth_imgs).astype(np.float32)

        # LARGE accumulated drift: deterministic per-step translation bias
        # — the estimated end pose is ~0.6 m from the start, far past any
        # reasonable pose-proximity gate
        drifted = [true_poses[0]]
        for k in range(1, L):
            inc = np.linalg.inv(true_poses[k - 1]) @ true_poses[k]
            bias = np.eye(4, dtype=np.float32)
            bias[:3, 3] = [-0.12, 0.06, 0.0]
            drifted.append(drifted[-1] @ (bias @ inc))
        drifted = np.stack(drifted).astype(np.float32)

        return (
            jnp.asarray(true_poses),
            jnp.asarray(drifted),
            jnp.asarray(np.stack(frames)),
            jnp.asarray(np.stack(frame_normals)),
            jnp.ones((L, n_pts), bool),
            jnp.asarray(depth_imgs),
        )

    def _descriptors(self, depth_imgs):
        from gradslam_tpu.slam import keyframe_descriptors
        from gradslam_tpu.structures.rgbdimages import (
            compute_normal_map,
            compute_vertex_map,
        )

        L, H, W = depth_imgs.shape
        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 0.8 * W
        K[0, 2], K[1, 2] = W / 2.0, H / 2.0
        dep5 = depth_imgs[:, None, ..., None]  # (L, 1, H, W, 1)
        Kb = jnp.asarray(np.broadcast_to(K, (L, 1, 4, 4)).copy())
        vm = compute_vertex_map(dep5, Kb)
        valid = dep5 > 0
        nm = compute_normal_map(vm, valid)[:, 0]
        return keyframe_descriptors(
            depth_imgs, nm, depth_imgs > 0
        )

    def test_pose_proximity_fails_under_drift(self):
        _, drifted, *_ = self._make_drifted_loop()
        cand = detect_loop_closures(
            drifted, max_candidates=4, min_separation=5, max_distance=0.3
        )
        assert not bool(cand.valid.any()), (
            "drift too small: pose proximity still detects the loop"
        )

    def test_descriptor_detects_the_revisit(self):
        from gradslam_tpu.slam import detect_loop_closures_descriptor

        *_, depth_imgs = self._make_drifted_loop()
        descs = self._descriptors(depth_imgs)
        cand = detect_loop_closures_descriptor(
            descs, max_candidates=4, min_separation=5,
            max_descriptor_dist=0.1,
        )
        got = np.asarray(cand.edges)[np.asarray(cand.valid)]
        assert any((i == 0 and j == 8) for i, j in got), got

    def test_close_loops_appearance_fixes_what_pose_cannot(self):
        tp, drifted, pts, nrm, valid, depth_imgs = self._make_drifted_loop()
        err_before = _pose_err(drifted, tp)
        assert err_before > 0.3

        # pose-proximity detection: finds nothing, trajectory unchanged
        ref_pose, _, w_pose = close_loops(
            drifted, pts, nrm, valid,
            max_candidates=4, min_separation=5, max_distance=0.3,
            detection="pose",
        )
        assert not bool((w_pose > 0).any())
        assert _pose_err(ref_pose, drifted) < 1e-4

        # appearance detection: finds + verifies (identity init), fixes
        descs = self._descriptors(depth_imgs)
        refined, cand, w = close_loops(
            drifted, pts, nrm, valid,
            max_candidates=4, min_separation=5, max_distance=0.3,
            detection="appearance", descriptors=descs,
            max_descriptor_dist=0.1,
        )
        assert bool((w > 0).any()), "no appearance loop edges accepted"
        err_after = _pose_err(refined, tp)
        assert err_after < 0.5 * err_before, (
            f"drift not reduced: {err_before:.4f} -> {err_after:.4f}"
        )

    def test_option_validation(self):
        tp, drifted, pts, nrm, valid, _ = self._make_drifted_loop()
        with pytest.raises(ValueError, match="requires descriptors"):
            close_loops(drifted, pts, nrm, valid, detection="appearance")
        with pytest.raises(ValueError, match="detection must be"):
            close_loops(drifted, pts, nrm, valid, detection="nope")


class TestViewpointRobustDetection:
    """Revisit at 35 deg yaw under large drift: pose-proximity detection
    AND the grid appearance descriptor both fail; the viewpoint-invariant
    descriptor + multistart ICP verification closes the loop."""

    # the final frame revisits frame 0's view rotated 33 deg; every other
    # frame is >=60 deg of yaw away from both (no easier revisit exists)
    L = 5
    YAWS_DEG = [0.0, 95.0, 190.0, 285.0, 33.0]
    FOV_DEG = 90.0

    @classmethod
    def _make_yaw_loop(cls, n_pts=1024, seed=5):
        """Camera at the origin inside a heterogeneous ring scene; each
        frame sees a 90 deg azimuth window. The last frame revisits the
        first VIEW but rotated 35 deg. Odometry drift accumulates a
        ~0.5 m position error."""
        rng = np.random.RandomState(seed)
        theta = rng.uniform(-np.pi, np.pi, n_pts).astype(np.float32)
        # heterogeneous ring room: six 60-deg wall sectors with DISTINCT
        # smooth geometry (radius level, corrugation frequency/amplitude,
        # wall height), plus a floor — different view windows are
        # geometrically distinguishable (the property place recognition
        # needs) while every surface is locally smooth with consistent
        # normals (the property point-to-plane ICP needs)
        sector = ((theta + np.pi) / (2 * np.pi / 6)).astype(int) % 6
        r_base = np.array([2.0, 3.0, 1.3, 2.6, 1.6, 3.4], np.float32)
        amp = np.array([0.02, 0.35, 0.1, 0.25, 0.02, 0.4], np.float32)
        freq = np.array([3.0, 7.0, 11.0, 5.0, 9.0, 4.0], np.float32)
        h_env = np.array([0.3, 1.0, 0.15, 0.7, 0.5, 1.2], np.float32)

        a, f = amp[sector], freq[sector]
        r = (r_base[sector] + a * np.sin(f * theta)).astype(np.float32)
        rp = (a * f * np.cos(f * theta)).astype(np.float32)  # dr/dtheta
        y = (h_env[sector] * rng.uniform(-1, 1, n_pts)).astype(np.float32)

        n_floor = n_pts // 4  # floor disk: constrains y in point-to-plane
        rho = np.sqrt(rng.uniform(0.05, 1.0, n_floor)).astype(np.float32)
        rho = rho * (r_base[sector[:n_floor]] - 0.1)
        world = np.stack([r * np.sin(theta), y, r * np.cos(theta)], -1)
        world[:n_floor] = np.stack(
            [
                rho * np.sin(theta[:n_floor]),
                -0.8 * np.ones(n_floor, np.float32),
                rho * np.cos(theta[:n_floor]),
            ],
            -1,
        )
        # exact inward wall normals from the surface r(theta): the
        # surface tangent along theta is d/dtheta (r sin, y, r cos)
        st, ct = np.sin(theta), np.cos(theta)
        n_wall = np.stack(
            [rp * ct - r * st, np.zeros(n_pts, np.float32), -rp * st - r * ct],
            -1,
        )
        n_wall /= np.linalg.norm(n_wall, axis=-1, keepdims=True)
        # orient toward the origin
        flip = (n_wall * world).sum(-1) > 0
        n_wall[flip] *= -1
        nrm_w = n_wall.astype(np.float32)
        nrm_w[:n_floor] = [0.0, 1.0, 0.0]

        yaws = np.deg2rad(cls.YAWS_DEG).astype(np.float32)
        half_fov = np.deg2rad(cls.FOV_DEG) / 2

        true_poses, pts, nrms, vals = [], [], [], []
        for psi in yaws:
            c, s = np.cos(psi), np.sin(psi)
            R = np.array(
                [[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32
            )  # camera-to-world yaw
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R
            true_poses.append(T)
            p_cam = world @ R  # R^-1 = R^T applied to rows
            n_cam = nrm_w @ R
            az = np.arctan2(p_cam[:, 0], p_cam[:, 2])
            vis = np.abs(az) < half_fov
            pts.append(np.where(vis[:, None], p_cam, 0.0))
            nrms.append(np.where(vis[:, None], n_cam, 0.0))
            vals.append(vis)
        true_poses = np.stack(true_poses)

        # large accumulated drift (deterministic per-step bias)
        drifted = [true_poses[0]]
        for k in range(1, cls.L):
            inc = np.linalg.inv(true_poses[k - 1]) @ true_poses[k]
            bias = np.eye(4, dtype=np.float32)
            # dominant vertical component: yaw rotation between steps
            # cancels horizontal biases, the y component accumulates
            bias[:3, 3] = [0.03, -0.08, 0.02]
            drifted.append(drifted[-1] @ (bias @ inc))
        drifted = np.stack(drifted).astype(np.float32)

        return (
            jnp.asarray(true_poses),
            jnp.asarray(drifted),
            jnp.asarray(np.stack(pts).astype(np.float32)),
            jnp.asarray(np.stack(nrms).astype(np.float32)),
            jnp.asarray(np.stack(vals)),
        )

    @classmethod
    def _grid_descriptors(cls, H=48, W=64):
        """Grid descriptors from synthetic per-frame depth panout images:
        each frame's depth image is the same 360-periodic azimuth
        function sampled over its own 90 deg yaw window — the same scene
        seen from rotated viewpoints."""
        from gradslam_tpu.slam import keyframe_descriptors
        from gradslam_tpu.structures.rgbdimages import (
            compute_normal_map,
            compute_vertex_map,
        )

        u = np.linspace(-0.5, 0.5, W, dtype=np.float32)
        v = np.linspace(0.0, 1.0, H, dtype=np.float32)[:, None]
        fov = np.deg2rad(cls.FOV_DEG)
        imgs = []
        for psi_deg in cls.YAWS_DEG:
            az = np.deg2rad(psi_deg) + u * fov
            imgs.append(
                2.0 + 0.8 * np.sin(3 * az) + 0.4 * np.cos(5 * az)
                + 0.3 * np.sin(4 * v + az)
            )
        depth_imgs = jnp.asarray(np.stack(imgs).astype(np.float32))

        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 0.8 * W
        K[0, 2], K[1, 2] = W / 2.0, H / 2.0
        dep5 = depth_imgs[:, None, ..., None]
        Kb = jnp.asarray(np.broadcast_to(K, (cls.L, 1, 4, 4)).copy())
        vm = compute_vertex_map(dep5, Kb)
        nm = compute_normal_map(vm, dep5 > 0)[:, 0]
        return keyframe_descriptors(depth_imgs, nm, depth_imgs > 0)

    def test_pose_and_grid_both_fail(self):
        from gradslam_tpu.slam import detect_loop_closures_descriptor

        tp, drifted, *_ = self._make_yaw_loop()
        cand = detect_loop_closures(
            drifted, max_candidates=4, min_separation=2, max_distance=0.3
        )
        assert not bool(cand.valid.any()), "pose proximity unexpectedly found it"

        gdesc = self._grid_descriptors()
        gcand = detect_loop_closures_descriptor(
            gdesc, max_candidates=4, min_separation=2,
            max_descriptor_dist=0.25,
        )
        got = np.asarray(gcand.edges)[np.asarray(gcand.valid)]
        assert not any(
            (i == 0 and j == self.L - 1) for i, j in got
        ), f"grid descriptor unexpectedly matched the rotated revisit: {got}"

    def test_invariant_descriptor_finds_the_rotated_revisit(self):
        from gradslam_tpu.slam import (
            detect_loop_closures_descriptor,
            keyframe_descriptors_invariant,
        )

        tp, drifted, pts, nrm, valid = self._make_yaw_loop()
        desc = keyframe_descriptors_invariant(pts, nrm, valid)
        cand = detect_loop_closures_descriptor(
            desc, max_candidates=4, min_separation=2,
            max_descriptor_dist=0.05,
        )
        got = np.asarray(cand.edges)[np.asarray(cand.valid)]
        assert any((i == 0 and j == self.L - 1) for i, j in got), got

    def test_close_loops_invariant_multistart_cuts_drift(self):
        from gradslam_tpu.slam import keyframe_descriptors_invariant

        tp, drifted, pts, nrm, valid = self._make_yaw_loop()
        err_before = _pose_err(drifted, tp)
        assert err_before > 0.3

        desc = keyframe_descriptors_invariant(pts, nrm, valid)
        refined, cand, w = close_loops(
            drifted, pts, nrm, valid,
            max_candidates=4, min_separation=2,
            detection="appearance", descriptors=desc,
            max_descriptor_dist=0.05, min_inlier_frac=0.45,
        )
        assert bool((w > 0).any()), "no loop edges accepted"
        # the accepted measurement matches the true 35-deg-yaw relative
        edges = np.asarray(cand.edges)
        accepted = np.asarray(w) > 0
        for k in np.nonzero(accepted)[0]:
            i, j = edges[k]
            assert i == 0 and j == self.L - 1, (i, j)
        err_after = _pose_err(refined, tp)
        assert err_after < 0.5 * err_before, (
            f"drift not reduced: {err_before:.4f} -> {err_after:.4f}"
        )


class TestBatchedCloseLoops:
    """close_loops_batched == a host loop of per-item close_loops."""

    def _batch(self, seeds=(0, 7)):
        items = [_make_loop(seed=s, drift=0.03) for s in seeds]
        stack = lambda i: jnp.stack([it[i] for it in items])
        return stack(0), stack(1), stack(2), stack(3), stack(4)

    def test_matches_per_item_close_loops_pose_detection(self):
        from gradslam_tpu.slam import close_loops_batched

        _, drifted, pts, nrm, val = self._batch()
        kw = dict(
            max_candidates=4, min_separation=5, max_distance=0.3,
            icp_numiters=15, refine_iters=8,
        )
        ref = jnp.stack(
            [
                close_loops(drifted[b], pts[b], nrm[b], val[b], **kw)[0]
                for b in range(drifted.shape[0])
            ]
        )
        got, cand, w = close_loops_batched(drifted, pts, nrm, val, **kw)
        assert got.shape == ref.shape
        # same accepted edges and the same refined trajectories (identical
        # programs modulo batching — tolerances cover fused-order ULPs)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
        assert w.shape[0] == drifted.shape[0]

    def test_matches_per_item_both_detection(self):
        from gradslam_tpu.slam import (
            close_loops_batched,
            keyframe_descriptors_invariant,
        )

        _, drifted, pts, nrm, val = self._batch()
        B = drifted.shape[0]
        descs = jnp.stack(
            [
                keyframe_descriptors_invariant(pts[b], nrm[b], val[b])
                for b in range(B)
            ]
        )
        kw = dict(
            max_candidates=3, min_separation=5, max_distance=0.3,
            icp_numiters=12, refine_iters=6, detection="both",
            appearance_init="identity",
        )
        ref = jnp.stack(
            [
                close_loops(
                    drifted[b], pts[b], nrm[b], val[b],
                    descriptors=descs[b], **kw
                )[0]
                for b in range(B)
            ]
        )
        got, _, _ = close_loops_batched(
            drifted, pts, nrm, val, descriptors=descs, **kw
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_validation(self):
        from gradslam_tpu.slam import close_loops_batched

        _, drifted, pts, nrm, val = self._batch()
        with pytest.raises(ValueError, match="detection"):
            close_loops_batched(drifted, pts, nrm, val, detection="nope")
        with pytest.raises(ValueError, match="descriptors"):
            close_loops_batched(
                drifted, pts, nrm, val, detection="appearance"
            )
