import numpy as np
import pytest

from gradslam_tpu.datasets import datautils


class TestNormalizeImage:
    def test_range(self):
        img = np.array([[0, 127.5, 255]], dtype=np.float32)
        out = datautils.normalize_image(img)
        np.testing.assert_allclose(out, [[0, 0.5, 1.0]])


class TestChannelsFirst:
    def test_basic(self):
        x = np.zeros((4, 5, 3))
        assert datautils.channels_first(x).shape == (3, 4, 5)

    def test_batched(self):
        x = np.zeros((2, 7, 4, 5, 3))
        assert datautils.channels_first(x).shape == (2, 7, 3, 4, 5)

    def test_raises_low_rank(self):
        with pytest.raises(ValueError):
            datautils.channels_first(np.zeros((4, 5)))


class TestScaleIntrinsics:
    def test_scaling(self):
        K = np.eye(4, dtype=np.float32)
        K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 525.0, 520.0, 319.5, 239.5
        out = datautils.scale_intrinsics(K, 0.25, 0.5)
        assert out[0, 0] == pytest.approx(525.0 * 0.5)
        assert out[1, 1] == pytest.approx(520.0 * 0.25)
        assert out[0, 2] == pytest.approx(319.5 * 0.5)
        assert out[1, 2] == pytest.approx(239.5 * 0.25)
        assert out[2, 2] == 1.0 and out[3, 3] == 1.0

    def test_no_mutation(self):
        K = np.eye(4, dtype=np.float32)
        datautils.scale_intrinsics(K, 2.0, 2.0)
        assert K[0, 0] == 1.0


class TestPointQuaternion:
    def test_identity(self):
        pq = np.array([1.0, 2.0, 3.0, 0, 0, 0, 1], dtype=np.float32)
        T = datautils.pointquaternion_to_homogeneous(pq)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3])

    def test_halfturn(self):
        pq = np.array([0, 0, 0, 0, 0, 1, 0], dtype=np.float32)  # 180 deg z
        T = datautils.pointquaternion_to_homogeneous(pq)
        np.testing.assert_allclose(T[:3, :3], np.diag([-1, -1, 1]), atol=1e-6)

    def test_batched_and_unnormalized(self):
        pq = np.zeros((5, 7), dtype=np.float32)
        pq[:, 6] = 2.0  # unnormalized w
        T = datautils.pointquaternion_to_homogeneous(pq)
        assert T.shape == (5, 4, 4)
        np.testing.assert_allclose(
            T[:, :3, :3], np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-6
        )


class TestPosesToTransforms:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        from gradslam_tpu.geometry import se3_exp
        import jax.numpy as jnp

        poses = [np.eye(4, dtype=np.float32)]
        for _ in range(4):
            step = np.asarray(se3_exp(jnp.asarray(rng.randn(6).astype(np.float32) * 0.2)))
            poses.append((poses[-1] @ step).astype(np.float32))
        poses = np.stack(poses)
        rel = datautils.poses_to_transforms(poses)
        # recompose
        acc = rel[0]
        np.testing.assert_allclose(acc, poses[0], atol=1e-5)
        for i in range(1, 5):
            acc = acc @ rel[i]
            np.testing.assert_allclose(acc, poses[i], atol=1e-4)


class TestCreateLabelImage:
    def test_palette(self):
        pred = np.array([[0, 1], [1, 0]])
        img = datautils.create_label_image(pred, {0: (0, 0, 0), 1: (255, 0, 0)})
        np.testing.assert_array_equal(img[0, 1], [255, 0, 0])
        np.testing.assert_array_equal(img[0, 0], [0, 0, 0])
