"""opts.model_rows: the dense-carried projective-odometry target rows
must reproduce the arena-gather formulation exactly.

The dense path (fusionutils.fusion_update_compact, dense_model_rows)
builds the per-pixel target rows from the frame's own merge results; the
gather path reads the arena at model_img next frame. Both read the same
values by construction — the test pins it end to end.
"""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence

DATA = pathlib.Path(__file__).parents[1] / "data" / "msrd_b2s3"
L = 6


def _sequence(ds=2):
    colors = np.load(DATA / "colors.npy").astype(np.float32)
    depths = np.load(DATA / "depths.npy").astype(np.float32)
    K = np.load(DATA / "intrinsics.npy").astype(np.float32).copy()
    idx = [i % colors.shape[1] for i in range(L)]
    colors, depths = colors[:, idx, ::ds, ::ds], depths[:, idx, ::ds, ::ds]
    K[:, :, :2] /= ds
    return jnp.asarray(colors), jnp.asarray(depths), jnp.asarray(K)


class TestDenseModelRows:
    def test_dense_equals_gather_unwindowed(self):
        colors, depths, K = _sequence()
        B, _, H, W, _ = colors.shape
        cap = 16 * H * W  # past the 12*H*W auto crossover
        kw = dict(odom="gradicp", numiters=6, fusion=True,
                  assoc="projective")
        mg, pg = slam_sequence(
            colors, depths, K, None,
            SLAMOptions(model_rows="gather", **kw), cap,
        )
        md, pd = slam_sequence(
            colors, depths, K, None,
            SLAMOptions(model_rows="dense", **kw), cap,
        )
        np.testing.assert_array_equal(np.asarray(pg), np.asarray(pd))
        np.testing.assert_array_equal(
            np.asarray(mg.data), np.asarray(md.data)
        )
        np.testing.assert_array_equal(
            np.asarray(mg.num_points), np.asarray(md.num_points)
        )

    def test_dense_equals_gather_windowed(self):
        """With assoc_window the two programs differ in shape, so XLA
        fusion rounding may differ by ulps — geometric tolerance."""
        colors, depths, K = _sequence()
        B, _, H, W, _ = colors.shape
        cap = 16 * H * W
        kw = dict(odom="gradicp", numiters=6, fusion=True,
                  assoc="projective", assoc_window=4 * H * W)
        _, pg = slam_sequence(
            colors, depths, K, None,
            SLAMOptions(model_rows="gather", **kw), cap,
        )
        _, pd = slam_sequence(
            colors, depths, K, None,
            SLAMOptions(model_rows="dense", **kw), cap,
        )
        np.testing.assert_allclose(
            np.asarray(pg), np.asarray(pd), atol=1e-6
        )

    def test_auto_threshold(self):
        from gradslam_tpu.slam.fusionutils import _resolve_model_rows

        assert not _resolve_model_rows("auto", 120, 160, 10 * 120 * 160)
        assert _resolve_model_rows("auto", 120, 160, 16 * 120 * 160)
        assert _resolve_model_rows("dense", 120, 160, 100)
        assert not _resolve_model_rows("gather", 120, 160, 10**9)
        with pytest.raises(ValueError, match="model_rows"):
            _resolve_model_rows("nope", 120, 160, 100)
