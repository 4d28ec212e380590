"""compact_masked: scatter and sort formulations must agree exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.ops.masking import (
    _compact_masked_scatter,
    _compact_masked_sorted,
    compact_masked,
)


def _numpy_oracle(mask, out_size):
    idx = np.zeros((mask.shape[0], out_size), np.int32)
    valid = np.zeros((mask.shape[0], out_size), bool)
    for b in range(mask.shape[0]):
        nz = np.nonzero(mask[b])[0][:out_size]
        idx[b, : len(nz)] = nz
        valid[b, : len(nz)] = True
    return idx, valid


@pytest.mark.parametrize("out_size", [8, 64, 1000])
@pytest.mark.parametrize("density", [0.0, 0.03, 0.5, 1.0])
def test_methods_agree(out_size, density):
    rng = np.random.RandomState(42)
    B, N = 3, 8192
    mask = jnp.asarray(rng.rand(B, N) < density)
    i1, v1 = jax.jit(lambda m: _compact_masked_scatter(m, out_size))(mask)
    i2, v2 = jax.jit(lambda m: _compact_masked_sorted(m, out_size))(mask)
    io, vo = _numpy_oracle(np.asarray(mask), out_size)
    np.testing.assert_array_equal(np.asarray(v1), vo)
    np.testing.assert_array_equal(np.asarray(v2), vo)
    np.testing.assert_array_equal(np.where(vo, np.asarray(i1), 0), io)
    np.testing.assert_array_equal(np.where(vo, np.asarray(i2), 0), io)


def test_non_divisible_block():
    rng = np.random.RandomState(0)
    mask = jnp.asarray(rng.rand(2, 5000) < 0.2)  # not a multiple of block
    i1, v1 = _compact_masked_scatter(mask, 512)
    i2, v2 = _compact_masked_sorted(mask, 512, block=2048)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(
        np.where(np.asarray(v1), np.asarray(i1), 0),
        np.where(np.asarray(v2), np.asarray(i2), 0),
    )


def test_overflow_deterministic_drop():
    mask = jnp.ones((1, 40000), bool)
    i, v = compact_masked(mask, 128)  # auto -> sort at this size
    assert bool(v.all())
    np.testing.assert_array_equal(np.asarray(i[0]), np.arange(128))


def test_auto_dispatch_small_and_large():
    rng = np.random.RandomState(1)
    small = jnp.asarray(rng.rand(2, 1024) < 0.3)
    large = jnp.asarray(rng.rand(2, 65536) < 0.3)
    for m in (small, large):
        ia, va = compact_masked(m, 256)
        ib, vb = compact_masked(m, 256, method="scatter")
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        np.testing.assert_array_equal(
            np.where(np.asarray(va), np.asarray(ia), 0),
            np.where(np.asarray(vb), np.asarray(ib), 0),
        )
