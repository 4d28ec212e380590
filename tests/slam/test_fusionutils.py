import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.slam import (
    find_active_map_points,
    find_correspondences,
    find_correspondences_dense,
    get_alpha,
    update_map_aggregate,
    update_map_fusion,
)
from gradslam_tpu.slam.fusionutils import _pointclouds_to_mapstate
from gradslam_tpu.structures import Pointclouds, RGBDImages
from gradslam_tpu.structures.utils import pointclouds_from_rgbdimages

DOT_TH = float(np.cos(np.radians(20.0)))


@pytest.fixture
def frame0(msrd_data):
    """Frame 0 of the golden clip as a (B=2, L=1) RGBDImages."""
    return RGBDImages(
        msrd_data["colors"][:, :1],
        msrd_data["depths"][:, :1],
        msrd_data["intrinsics"],
        msrd_data["poses"][:, :1],
    )


@pytest.fixture
def frame1(msrd_data):
    return RGBDImages(
        msrd_data["colors"][:, 1:2],
        msrd_data["depths"][:, 1:2],
        msrd_data["intrinsics"],
        msrd_data["poses"][:, 1:2],
    )


class TestGetAlpha:
    def test_hand_values(self):
        # alpha = exp(-|p|^2 / (2 sigma^2)), reference fusionutils.py:69-73
        pts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        a = np.asarray(get_alpha(pts, sigma=0.6))
        np.testing.assert_allclose(a, [1.0, np.exp(-1.0 / 0.72)], rtol=1e-5)

    def test_clamp_bounds(self):
        pts = jnp.asarray([[100.0, 0.0, 0.0]])
        a = float(get_alpha(pts, sigma=0.6)[0])
        assert a == pytest.approx(1e-7)

    def test_gradcheck(self):
        # the one real gradcheck in the reference suite
        # (test_fusionutils.py:56-75) — finite differences vs AD
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.randn(5, 3).astype(np.float32) * 0.3)

        f = lambda p: jnp.sum(get_alpha(p, sigma=0.6))
        g = np.asarray(jax.grad(f)(pts))
        eps = 1e-3
        for i in range(5):
            for j in range(3):
                delta = np.zeros((5, 3), np.float32)
                delta[i, j] = eps
                fd = (float(f(pts + delta)) - float(f(pts - delta))) / (2 * eps)
                np.testing.assert_allclose(g[i, j], fd, rtol=1e-2, atol=1e-4)


class TestReprojectionInvariant:
    """Projecting a map built from frame 0 back onto frame 0 must hit
    exactly the valid-depth pixels and reproduce colors
    (reference test_fusionutils.py:305-333)."""

    def test_active_map_points_hit_valid_pixels(self, frame0):
        pc = pointclouds_from_rgbdimages(frame0)
        table = np.asarray(find_active_map_points(pc, frame0))
        valid = np.asarray(frame0.valid_depth_mask)[:, 0, ..., 0]
        n_valid = valid.sum()
        assert table.shape[0] == n_valid
        # every (b, h, w) in the table is a valid-depth pixel
        assert valid[table[:, 0], table[:, 2], table[:, 3]].all()

    def test_correspondences_reproduce_colors(self, frame0):
        pc = pointclouds_from_rgbdimages(frame0)
        # ccounts needed by unique-correspondence stage
        pc.features_padded = (
            jnp.ones(pc.points_padded.shape[:2] + (1,))
            * pc.nonpad_mask[..., None]
        )
        table = np.asarray(
            find_correspondences(pc, frame0, dist_th=0.05, dot_th=DOT_TH)
        )
        colors = np.asarray(frame0.rgb_image)[:, 0]
        map_colors = np.asarray(pc.colors_padded)
        got = map_colors[table[:, 0], table[:, 1]]
        expect = colors[table[:, 0], table[:, 2], table[:, 3]]
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_dense_matches_table_winner_count(self, frame0):
        pc = pointclouds_from_rgbdimages(frame0)
        pc.features_padded = (
            jnp.ones(pc.points_padded.shape[:2] + (1,))
            * pc.nonpad_mask[..., None]
        )
        table = np.asarray(
            find_correspondences(pc, frame0, dist_th=0.05, dot_th=DOT_TH)
        )
        ms = _pointclouds_to_mapstate(pc)
        rgbd = frame0.to_channels_last()
        corr = find_correspondences_dense(
            ms,
            rgbd.global_vertex_map[:, 0],
            rgbd.global_normal_map[:, 0],
            rgbd.poses[:, 0],
            rgbd.intrinsics,
            0.05,
            DOT_TH,
        )
        assert int(np.asarray(corr.winner).sum()) == table.shape[0]
        # winners are the same (b, n) pairs
        wb, wn = np.nonzero(np.asarray(corr.winner))
        got = set(zip(wb.tolist(), wn.tolist()))
        expect = set(zip(table[:, 0].tolist(), table[:, 1].tolist()))
        assert got == expect


class TestMapUpdates:
    def test_aggregate_counts(self, frame0, frame1):
        pc = update_map_aggregate(Pointclouds(), frame0)
        v0 = np.asarray(frame0.valid_depth_mask)[:, 0, ..., 0].sum((1, 2))
        np.testing.assert_array_equal(
            np.asarray(pc.num_points_per_pointcloud), v0
        )
        pc = update_map_aggregate(pc, frame1)
        v1 = np.asarray(frame1.valid_depth_mask)[:, 0, ..., 0].sum((1, 2))
        np.testing.assert_array_equal(
            np.asarray(pc.num_points_per_pointcloud), v0 + v1
        )

    def test_fusion_no_growth_on_refusing_same_frame(self, frame0):
        """Fusing the same frame twice must not (significantly) grow the
        map: corresponded pixels merge instead of appending."""
        pc = update_map_fusion(
            Pointclouds(), frame0, dist_th=0.05, dot_th=DOT_TH, sigma=0.6
        )
        n1 = np.asarray(pc.num_points_per_pointcloud).copy()
        pc2 = update_map_fusion(
            pc, frame0, dist_th=0.05, dot_th=DOT_TH, sigma=0.6
        )
        n2 = np.asarray(pc2.num_points_per_pointcloud)
        # all valid pixels should correspond to their own map points
        growth = (n2 - n1) / n1
        assert growth.max() < 0.05, f"map grew {growth} on identical refusion"

    def test_fusion_merge_preserves_positions_same_frame(self, frame0):
        pc = update_map_fusion(
            Pointclouds(), frame0, dist_th=0.05, dot_th=DOT_TH, sigma=0.6
        )
        pc2 = update_map_fusion(
            pc, frame0, dist_th=0.05, dot_th=DOT_TH, sigma=0.6
        )
        n = int(pc.num_points_per_pointcloud[0])
        a = np.asarray(pc.points_padded[0, :n])
        b = np.asarray(pc2.points_padded[0, :n])
        # merging identical observations leaves positions unchanged
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_fusion_ccounts_increase(self, frame0):
        pc = update_map_fusion(
            Pointclouds(), frame0, dist_th=0.05, dot_th=DOT_TH, sigma=0.6
        )
        pc2 = update_map_fusion(
            pc, frame0, dist_th=0.05, dot_th=DOT_TH, sigma=0.6
        )
        n = int(pc.num_points_per_pointcloud[0])
        c1 = np.asarray(pc.features_padded[0, :n, 0])
        c2 = np.asarray(pc2.features_padded[0, :n, 0])
        assert (c2 >= c1 - 1e-6).all()
        assert c2.mean() > c1.mean() * 1.5


class TestCompactFusionEquivalence:
    """fusion_update_compact must produce the same map as the two-step
    find_correspondences_dense + fuse_map_dense path."""

    def test_matches_two_step(self, frame0, frame1):
        from gradslam_tpu.slam.fusionutils import (
            find_correspondences_dense,
            fuse_map_dense,
            fusion_update_compact,
        )
        from gradslam_tpu.structures.maparena import init_map

        rgbd0 = frame0.to_channels_last()
        rgbd1 = frame1.to_channels_last()
        B, _, H, W = rgbd0.shape
        cap = 3 * H * W

        def frame_arrays(r):
            return (
                r.global_vertex_map[:, 0],
                r.global_normal_map[:, 0],
                r.vertex_map[:, 0],
                r.rgb_image[:, 0],
                r.valid_depth_mask[:, 0, ..., 0],
            )

        # seed map with frame 0 via the compact path (assoc_window=0 pins
        # the full-arena program — the exact-equivalence oracle; the
        # window tiers are compared separately below at ulp tolerance,
        # XLA fuses the merge arithmetic differently per program shape)
        gv, gn, lv, rgb, vd = frame_arrays(rgbd0)
        m = init_map(B, cap)
        m = fusion_update_compact(
            m, gv, gn, lv, rgb, vd, rgbd0.poses[:, 0], rgbd0.intrinsics,
            0.05, DOT_TH, 0.6, 4 * H * W, assoc_window=0,
        )

        gv, gn, lv, rgb, vd = frame_arrays(rgbd1)
        pose1 = rgbd1.poses[:, 0]
        # two-step reference path
        corr = find_correspondences_dense(
            m, gv, gn, pose1, rgbd1.intrinsics, 0.05, DOT_TH
        )
        m_ref = fuse_map_dense(m, corr, gv, gn, lv, rgb, vd, 0.6)
        # compact path
        m_fast = fusion_update_compact(
            m, gv, gn, lv, rgb, vd, pose1, rgbd1.intrinsics,
            0.05, DOT_TH, 0.6, 4 * H * W, assoc_window=0,
        )
        np.testing.assert_array_equal(
            np.asarray(m_fast.num_points), np.asarray(m_ref.num_points)
        )
        np.testing.assert_allclose(
            np.asarray(m_fast.points), np.asarray(m_ref.points), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(m_fast.ccounts), np.asarray(m_ref.ccounts), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(m_fast.colors), np.asarray(m_ref.colors), atol=1e-6
        )

    def _two_frame(self, frame0, frame1, cap_mult, **kw):
        from gradslam_tpu.slam.fusionutils import fusion_update_compact
        from gradslam_tpu.structures.maparena import init_map

        rgbd0 = frame0.to_channels_last()
        rgbd1 = frame1.to_channels_last()
        B, _, H, W = rgbd0.shape
        m = init_map(B, cap_mult * H * W)
        for r in (rgbd0, rgbd1):
            m = fusion_update_compact(
                m,
                r.global_vertex_map[:, 0],
                r.global_normal_map[:, 0],
                r.vertex_map[:, 0],
                r.rgb_image[:, 0],
                r.valid_depth_mask[:, 0, ..., 0],
                r.poses[:, 0],
                r.intrinsics,
                0.05, DOT_TH, 0.6, 4 * H * W,
                **kw,
            )
        return m

    def test_assoc_window_matches_full(self, frame0, frame1):
        """Capacity-windowed association must equal the full-arena program
        while the map fits the window: same winners (ccounts/num_points
        exact), values to within XLA fusion rounding (1-2 ulp)."""
        H, W = frame0.shape[2], frame0.shape[3]
        m_full = self._two_frame(frame0, frame1, 3, assoc_window=0)
        # the golden clip appends < H*W points/frame, so 2*H*W is exact
        m_win = self._two_frame(frame0, frame1, 3, assoc_window=2 * H * W)
        assert int(np.asarray(m_win.num_points).max()) <= 2 * H * W
        np.testing.assert_array_equal(
            np.asarray(m_win.num_points), np.asarray(m_full.num_points)
        )
        np.testing.assert_array_equal(
            np.asarray(m_win.ccounts), np.asarray(m_full.ccounts)
        )
        for attr in ("points", "normals", "colors"):
            np.testing.assert_allclose(
                np.asarray(getattr(m_win, attr)),
                np.asarray(getattr(m_full, attr)),
                rtol=1e-6, atol=1e-6,
            )

    def test_assoc_window_overflow_drops_deterministically(
        self, frame0, frame1
    ):
        """Rows past the window are excluded from association: affected
        pixels append duplicates (num_points grows vs the exact run), the
        result is deterministic, and windowed rows are untouched."""
        m_tiny = self._two_frame(frame0, frame1, 3, assoc_window=1024)
        m_tiny2 = self._two_frame(frame0, frame1, 3, assoc_window=1024)
        m_full = self._two_frame(frame0, frame1, 3, assoc_window=0)
        assert int(np.asarray(m_full.num_points).min()) > 1024
        # deterministic drop: bit-identical across runs
        np.testing.assert_array_equal(
            np.asarray(m_tiny.data), np.asarray(m_tiny2.data)
        )
        # unassociated points duplicate instead of merging
        assert (
            np.asarray(m_tiny.num_points) >= np.asarray(m_full.num_points)
        ).all()


class TestDenseWindowMergeEquivalence:
    """window_merge='dense' (round-5 fast path) vs 'rows' (the
    pre-round-5 row-compacted writeback, kept as the oracle): identical
    winners/appends/model image; merge VALUES agree to XLA fusion
    rounding (the dense path fuses the merge arithmetic into one
    elementwise pass; FMA contraction differs across program shapes)."""

    def _two_frame(self, frame0, frame1, window_merge, assoc_window,
                   active_capacity, labels=None, need_active_set=True):
        from gradslam_tpu.slam.fusionutils import fusion_update_compact
        from gradslam_tpu.structures.maparena import init_map

        rgbd0 = frame0.to_channels_last()
        rgbd1 = frame1.to_channels_last()
        B, _, H, W = rgbd0.shape
        m = init_map(B, 3 * H * W)
        acts = []
        for i, r in enumerate((rgbd0, rgbd1)):
            m, act = fusion_update_compact(
                m,
                r.global_vertex_map[:, 0],
                r.global_normal_map[:, 0],
                r.vertex_map[:, 0],
                r.rgb_image[:, 0],
                r.valid_depth_mask[:, 0, ..., 0],
                r.poses[:, 0],
                r.intrinsics,
                0.05, DOT_TH, 0.6, active_capacity,
                assoc_window=assoc_window,
                window_merge=window_merge,
                return_active=True,
                dense_model_rows=True,
                frame_labels=None if labels is None else labels[i],
                need_active_set=need_active_set,
            )
            acts.append(act)
        return m, acts[-1]

    @pytest.mark.parametrize(
        "assoc_window_mult,active_mult",
        [(2, 2), (3, 2)],  # compact=False (win<=A) and compact=True
        ids=["direct-window", "compacted"],
    )
    def test_dense_matches_rows(
        self, frame0, frame1, assoc_window_mult, active_mult
    ):
        H, W = frame0.shape[2], frame0.shape[3]
        rng = np.random.RandomState(0)
        labels = [
            jnp.asarray(rng.randint(0, 20, size=(2, H, W)).astype(np.int32))
            for _ in range(2)
        ]
        m_r, act_r = self._two_frame(
            frame0, frame1, "rows", assoc_window_mult * H * W,
            active_mult * H * W, labels,
        )
        m_d, act_d = self._two_frame(
            frame0, frame1, "dense", assoc_window_mult * H * W,
            active_mult * H * W, labels,
        )
        # winner/append structure: exact
        np.testing.assert_array_equal(
            np.asarray(m_d.num_points), np.asarray(m_r.num_points)
        )
        np.testing.assert_array_equal(
            np.asarray(m_d.ccounts), np.asarray(m_r.ccounts)
        )
        np.testing.assert_array_equal(
            np.asarray(m_d.labels), np.asarray(m_r.labels)
        )
        # the carried active set and model image: exact
        for a, b in zip(act_r, act_d):
            if a is None:
                assert b is None
                continue
            if a.dtype == np.float32:
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-5, atol=5e-5
                )
            else:
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # merge values: fusion-rounding tolerance
        for attr in ("points", "normals", "colors"):
            np.testing.assert_allclose(
                np.asarray(getattr(m_d, attr)),
                np.asarray(getattr(m_r, attr)),
                rtol=2e-5, atol=5e-5,
            )

    def test_gated_compaction_matches_when_nothing_drops(
        self, frame0, frame1
    ):
        """need_active_set=False compacts GATED rows instead of active
        rows (round 5, projective path). While the buffer holds every
        gated row this is bitwise-identical: a non-gated active can
        never win, so excluding it changes nothing."""
        H, W = frame0.shape[2], frame0.shape[3]
        m_a, _ = self._two_frame(
            frame0, frame1, "dense", 3 * H * W, 2 * H * W,
            need_active_set=True,
        )
        m_g, _ = self._two_frame(
            frame0, frame1, "dense", 3 * H * W, 2 * H * W,
            need_active_set=False,
        )
        np.testing.assert_array_equal(
            np.asarray(m_g.num_points), np.asarray(m_a.num_points)
        )
        np.testing.assert_array_equal(
            np.asarray(m_g.data), np.asarray(m_a.data)
        )


class TestWinnerWritebackWindow:
    """The windowed winner writeback (merge_window) must be bitwise equal
    to the row-scatter formulation, including the cond fallback when the
    winner span exceeds the window."""

    def _fused(self, frame0, frame1, merge_window):
        from gradslam_tpu.slam.fusionutils import fusion_update_compact
        from gradslam_tpu.structures.maparena import init_map

        rgbd0 = frame0.to_channels_last()
        rgbd1 = frame1.to_channels_last()
        B, _, H, W = rgbd0.shape
        cap = 3 * H * W

        def frame_arrays(r):
            return (
                r.global_vertex_map[:, 0],
                r.global_normal_map[:, 0],
                r.vertex_map[:, 0],
                r.rgb_image[:, 0],
                r.valid_depth_mask[:, 0, ..., 0],
            )

        # assoc_window=0: isolate the writeback comparison in the
        # full-arena program (the window tiers change program shape and
        # with it XLA's fusion rounding; they are tested separately)
        gv, gn, lv, rgb, vd = frame_arrays(rgbd0)
        m = init_map(B, cap)
        m = fusion_update_compact(
            m, gv, gn, lv, rgb, vd, rgbd0.poses[:, 0], rgbd0.intrinsics,
            0.05, DOT_TH, 0.6, 4 * H * W, merge_window=merge_window,
            assoc_window=0,
        )
        gv, gn, lv, rgb, vd = frame_arrays(rgbd1)
        return fusion_update_compact(
            m, gv, gn, lv, rgb, vd, rgbd1.poses[:, 0], rgbd1.intrinsics,
            0.05, DOT_TH, 0.6, 4 * H * W, merge_window=merge_window,
            assoc_window=0,
        )

    def test_window_matches_scatter(self, frame0, frame1):
        a = self._fused(frame0, frame1, None)
        b = self._fused(frame0, frame1, 2 * 120 * 160)
        np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))
        np.testing.assert_array_equal(
            np.asarray(a.num_points), np.asarray(b.num_points)
        )

    def test_fallback_when_span_exceeds_window(self, frame0, frame1):
        """A window far smaller than the winner span must fall back to the
        scatter and still produce identical results."""
        a = self._fused(frame0, frame1, None)
        b = self._fused(frame0, frame1, 64)
        np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))


class TestBlockGating:
    def test_gated_matches_ungated(self, frame0, frame1):
        """With enough visible-block capacity, block gating is exact."""
        from gradslam_tpu.slam.fusionutils import fusion_update_compact
        from gradslam_tpu.structures.maparena import init_map

        rgbd0 = frame0.to_channels_last()
        rgbd1 = frame1.to_channels_last()
        B, _, H, W = rgbd0.shape
        cap = 3 * H * W  # 57600 -> 113 blocks of 512

        def fa(r):
            return (
                r.global_vertex_map[:, 0],
                r.global_normal_map[:, 0],
                r.vertex_map[:, 0],
                r.rgb_image[:, 0],
                r.valid_depth_mask[:, 0, ..., 0],
            )

        # assoc_window=0 on the ungated reference: the block-gated path
        # merges into the full arena, so compare against the full-arena
        # program (same shapes -> same XLA fusion rounding)
        gv, gn, lv, rgb, vd = fa(rgbd0)
        m = init_map(B, cap)
        m = fusion_update_compact(
            m, gv, gn, lv, rgb, vd, rgbd0.poses[:, 0], rgbd0.intrinsics,
            0.05, DOT_TH, 0.6, 2 * H * W, assoc_window=0,
        )

        gv, gn, lv, rgb, vd = fa(rgbd1)
        pose1 = rgbd1.poses[:, 0]
        m_ref = fusion_update_compact(
            m, gv, gn, lv, rgb, vd, pose1, rgbd1.intrinsics,
            0.05, DOT_TH, 0.6, 2 * H * W, assoc_window=0,
        )
        m_gated = fusion_update_compact(
            m, gv, gn, lv, rgb, vd, pose1, rgbd1.intrinsics,
            0.05, DOT_TH, 0.6, 2 * H * W,
            block_size=512, visible_capacity=-(-cap // 512),
        )
        np.testing.assert_array_equal(
            np.asarray(m_gated.num_points), np.asarray(m_ref.num_points)
        )
        np.testing.assert_allclose(
            np.asarray(m_gated.data), np.asarray(m_ref.data), atol=1e-6
        )

    def test_end_to_end_with_gating(self, msrd_data):
        from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence

        colors = jnp.asarray(msrd_data["colors"])
        depths = jnp.asarray(msrd_data["depths"])
        K = jnp.asarray(msrd_data["intrinsics"])
        B, L, H, W, _ = colors.shape
        cap = L * H * W
        base = SLAMOptions(odom="gradicp", numiters=5, fusion=True)
        gated = base._replace(block_size=1024)
        _, p_ref = slam_sequence(colors, depths, K, None, base, cap)
        _, p_gat = slam_sequence(colors, depths, K, None, gated, cap)
        terr = np.linalg.norm(
            np.asarray(p_ref)[..., :3, 3] - np.asarray(p_gat)[..., :3, 3],
            axis=-1,
        )
        assert terr.max() < 5e-3, f"gated trajectory diverged {terr.max()}"
