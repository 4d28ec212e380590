"""Real-TPU equivalence of the dense-merge window writeback.

The round-4 KNN bf16 bug taught that two formulations can agree on CPU
and both be wrong (or diverge) on the chip, where matmul precision,
scatter lowering, and layout assignment differ. This pins the round-5
``window_merge='dense'`` path against the ``'rows'`` oracle ON THE
HARDWARE, through the full fused scan at a window size that exercises
both the compacted (win > A) and direct (win <= A) regimes, checking
the winner structure exactly and the merge values to fusion rounding.
"""

import os
import pathlib

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("GRADSLAM_TPU_TEST_REAL"),
    reason="needs real TPU (set GRADSLAM_TPU_TEST_REAL=1)",
)

DATA = pathlib.Path(__file__).parents[1] / "data" / "msrd_b2s3"


@pytest.mark.parametrize("win_mult,act_mult", [(2, 2), (3, 2)],
                         ids=["direct-window", "compacted"])
def test_dense_matches_rows_on_chip(win_mult, act_mult):
    import jax
    import jax.numpy as jnp

    from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence

    colors = np.load(DATA / "colors.npy").astype(np.float32)
    depths = np.load(DATA / "depths.npy").astype(np.float32)
    K = np.load(DATA / "intrinsics.npy").astype(np.float32)
    B, L, H, W, _ = colors.shape
    cap = L * H * W

    outs = {}
    for wm in ("rows", "dense"):
        opts = SLAMOptions(
            odom="gradicp", numiters=8, dsratio=4, fusion=True,
            assoc="projective", assoc_window=win_mult * H * W,
            active_capacity=act_mult * H * W, window_merge=wm,
        )
        m, poses = jax.jit(
            slam_sequence, static_argnames=("opts", "capacity")
        )(jnp.asarray(colors), jnp.asarray(depths), jnp.asarray(K),
          None, opts, cap)
        outs[wm] = (
            np.asarray(m.num_points), np.asarray(m.ccounts),
            np.asarray(m.points), np.asarray(poses),
        )

    npts_r, cc_r, pts_r, p_r = outs["rows"]
    npts_d, cc_d, pts_d, p_d = outs["dense"]
    # winner/append structure: exact on the chip
    np.testing.assert_array_equal(npts_d, npts_r)
    np.testing.assert_array_equal(cc_d, cc_r)
    # merge values / trajectory: fusion rounding only
    np.testing.assert_allclose(pts_d, pts_r, rtol=2e-5, atol=5e-5)
    np.testing.assert_allclose(p_d, p_r, rtol=1e-5, atol=1e-5)
