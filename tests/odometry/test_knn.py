import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.ops import knn, knn_reference


class TestKNNReference:
    def test_exact_match_bruteforce(self):
        rng = np.random.RandomState(0)
        src = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))
        tgt = jnp.asarray(rng.randn(2, 80, 3).astype(np.float32))
        d, i = knn_reference(src, tgt)
        # numpy brute force
        dn = (
            np.sum(np.asarray(src) ** 2, -1)[:, :, None]
            - 2 * np.einsum("bsc,btc->bst", np.asarray(src), np.asarray(tgt))
            + np.sum(np.asarray(tgt) ** 2, -1)[:, None, :]
        )
        np.testing.assert_array_equal(np.asarray(i), dn.argmin(-1))
        np.testing.assert_allclose(np.asarray(d), dn.min(-1), atol=1e-4)

    def test_validity_mask(self):
        src = jnp.zeros((1, 1, 3))
        tgt = jnp.asarray([[[0.1, 0, 0], [5.0, 0, 0]]])
        valid = jnp.asarray([[False, True]])
        d, i = knn(src, tgt, valid, use_pallas=False)
        assert int(i[0, 0]) == 1
        np.testing.assert_allclose(float(d[0, 0]), 25.0, rtol=1e-5)

    def test_self_match(self):
        rng = np.random.RandomState(1)
        pts = jnp.asarray(rng.randn(1, 30, 3).astype(np.float32))
        d, i = knn(pts, pts, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(i[0]), np.arange(30))
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-5)

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            knn(jnp.zeros((2, 3)), jnp.zeros((1, 4, 3)))
