"""Semantic label fusion: streaming-majority labels in the arena channels."""

import jax.numpy as jnp
import numpy as np
import pathlib

from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence

DATA = pathlib.Path(__file__).parents[1] / "data" / "msrd_b2s3"


def _golden(L=4):
    colors = np.load(DATA / "colors.npy").astype(np.float32)
    depths = np.load(DATA / "depths.npy").astype(np.float32)
    K = np.load(DATA / "intrinsics.npy").astype(np.float32)
    poses = np.load(DATA / "poses.npy").astype(np.float32)
    idx = [i % colors.shape[1] for i in range(L)]
    return (
        jnp.asarray(colors[:, idx]),
        jnp.asarray(depths[:, idx]),
        jnp.asarray(K),
        jnp.asarray(poses[:, idx]),
    )


class TestSemanticFusion:
    def test_labels_land_in_arena(self):
        colors, depths, K, poses = _golden(L=3)
        B, L, H, W, _ = colors.shape
        # left half label 1, right half label 2, constant across frames
        lab = np.where(np.arange(W)[None, :] < W // 2, 1.0, 2.0)
        labels = jnp.asarray(
            np.broadcast_to(lab, (B, L, H, W)).astype(np.float32)
        )
        opts = SLAMOptions(odom="gt", fusion=True)
        m, _ = slam_sequence(
            colors, depths, K, poses, opts, L * H * W, labels_seq=labels
        )
        n = int(m.num_points[0])
        labs = np.asarray(m.labels[0][:n])
        confs = np.asarray(m.label_conf[0][:n])
        assert set(np.unique(labs)) <= {1.0, 2.0}
        assert (confs > 0).all()
        # both classes present in sensible proportion
        frac1 = (labs == 1.0).mean()
        assert 0.2 < frac1 < 0.8

    def test_merges_grow_confidence(self):
        # same frame repeated with gt identity-relative poses: every pixel
        # merges, confidence strictly grows vs a single frame
        colors, depths, K, poses = _golden(L=1)
        B, _, H, W, _ = colors.shape
        colors3 = jnp.concatenate([colors] * 3, axis=1)
        depths3 = jnp.concatenate([depths] * 3, axis=1)
        poses3 = jnp.concatenate([poses[:, :1]] * 3, axis=1)
        labels = jnp.ones((B, 3, H, W), jnp.float32) * 5.0
        opts = SLAMOptions(odom="gt", fusion=True)
        m1, _ = slam_sequence(
            colors, depths, K, poses[:, :1], opts, 3 * H * W,
            labels_seq=labels[:, :1],
        )
        m3, _ = slam_sequence(
            colors3, depths3, K, poses3, opts, 3 * H * W, labels_seq=labels
        )
        n = int(m1.num_points[0])
        c1 = np.asarray(m1.label_conf[0][:n]).mean()
        c3 = np.asarray(m3.label_conf[0][:n]).mean()
        assert c3 > 1.5 * c1
        assert (np.asarray(m3.labels[0][:n]) == 5.0).all()

    def test_majority_flip(self):
        # frame 1 labels everything 1; frames 2-3 label everything 2 ->
        # repeated disagreement flips the stored label to 2
        colors, depths, K, poses = _golden(L=1)
        B, _, H, W, _ = colors.shape
        colors4 = jnp.concatenate([colors] * 4, axis=1)
        depths4 = jnp.concatenate([depths] * 4, axis=1)
        poses4 = jnp.concatenate([poses[:, :1]] * 4, axis=1)
        lab = np.ones((B, 4, H, W), np.float32) * 2.0
        lab[:, 0] = 1.0
        opts = SLAMOptions(odom="gt", fusion=True)
        m, _ = slam_sequence(
            colors4, depths4, K, poses4, opts, 4 * H * W,
            labels_seq=jnp.asarray(lab),
        )
        n = int(m.num_points[0])
        labs = np.asarray(m.labels[0][:n])
        # merged points started as 1, saw 2 three times -> flipped to 2
        assert (labs == 2.0).mean() > 0.9

    def test_labels_with_assoc_window(self):
        """Semantic fusion under the capacity-windowed association: same
        labels/winners as the full-arena program (exact integer channels;
        confidences within fusion-rounding ulp)."""
        colors, depths, K, poses = _golden(L=3)
        B, L, H, W, _ = colors.shape
        lab = np.where(np.arange(W)[None, :] < W // 2, 1.0, 2.0)
        labels = jnp.asarray(
            np.broadcast_to(lab, (B, L, H, W)).astype(np.float32)
        )
        out = {}
        for aw in (0, 2 * H * W):
            opts = SLAMOptions(odom="gt", fusion=True, assoc_window=aw)
            m, _ = slam_sequence(
                colors, depths, K, poses, opts, 3 * H * W,
                labels_seq=labels,
            )
            out[aw] = m
        np.testing.assert_array_equal(
            np.asarray(out[0].num_points),
            np.asarray(out[2 * H * W].num_points),
        )
        np.testing.assert_array_equal(
            np.asarray(out[0].labels), np.asarray(out[2 * H * W].labels)
        )
        np.testing.assert_allclose(
            np.asarray(out[0].label_conf),
            np.asarray(out[2 * H * W].label_conf),
            rtol=1e-6, atol=1e-6,
        )

    def test_no_labels_unchanged(self):
        # without labels the semantic channels stay zero and results match
        colors, depths, K, poses = _golden(L=3)
        B, L, H, W, _ = colors.shape
        opts = SLAMOptions(odom="gradicp", numiters=4, fusion=True)
        m0, p0 = slam_sequence(colors, depths, K, None, opts, L * H * W)
        assert float(jnp.abs(m0.data[..., 10:12]).max()) == 0.0
        labels = jnp.ones((B, L, H, W), jnp.float32)
        m1, p1 = slam_sequence(
            colors, depths, K, None, opts, L * H * W, labels_seq=labels
        )
        # geometry/trajectory identical with or without label fusion
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=0)
        np.testing.assert_allclose(
            np.asarray(m0.data[..., :10]), np.asarray(m1.data[..., :10]),
            atol=0,
        )
