import jax.numpy as jnp
import numpy as np

from gradslam_tpu.metrics import chamfer_distance, map_accuracy


class TestChamfer:
    def test_zero_for_identical(self):
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))
        cd = chamfer_distance(pts, pts)
        np.testing.assert_allclose(np.asarray(cd), 0.0, atol=1e-5)

    def test_known_offset(self):
        a = jnp.zeros((1, 10, 3))
        b = jnp.zeros((1, 10, 3)).at[..., 0].set(0.5)
        cd = chamfer_distance(a, b)
        np.testing.assert_allclose(np.asarray(cd), 0.5, atol=1e-5)  # 2*0.25

    def test_unsquared(self):
        a = jnp.zeros((1, 4, 3))
        b = jnp.zeros((1, 4, 3)).at[..., 1].set(2.0)
        cd = chamfer_distance(a, b, squared=False)
        np.testing.assert_allclose(np.asarray(cd), 4.0, atol=1e-4)

    def test_validity_masks(self):
        a = jnp.asarray([[[0.0, 0, 0], [100.0, 0, 0]]])
        b = jnp.asarray([[[0.0, 0, 0], [0.1, 0, 0]]])
        va = jnp.asarray([[True, False]])  # outlier masked out
        cd = chamfer_distance(a, b, valid_a=va)
        assert float(cd[0]) < 0.02


class TestMapAccuracy:
    def test_perfect_map(self):
        rng = np.random.RandomState(1)
        pts = jnp.asarray(rng.randn(1, 40, 3).astype(np.float32))
        acc, comp = map_accuracy(pts, pts)
        np.testing.assert_allclose(np.asarray(acc), 1.0)
        np.testing.assert_allclose(np.asarray(comp), 1.0)

    def test_partial_coverage(self):
        gt = jnp.asarray(
            np.stack(
                [np.linspace(0, 1, 20), np.zeros(20), np.zeros(20)], -1
            ).astype(np.float32)
        )[None]
        half = gt[:, :10]
        acc, comp = map_accuracy(half, gt, threshold=0.02)
        np.testing.assert_allclose(np.asarray(acc), 1.0)  # all map pts on gt
        assert 0.4 < float(comp[0]) < 0.7  # half the gt covered
