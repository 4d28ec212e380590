"""Pipeline parallelism: the 2-stage pipelined schedule must reproduce
the single-device ``slam_sequence`` (the handoff moves identical math one
step earlier onto another device)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.parallel.pipeline import (
    pipeline_mesh,
    pipelined_slam_sequence,
)
from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence


@pytest.fixture
def seq(msrd_data):
    colors = jnp.asarray(msrd_data["colors"])  # (2, 3, 120, 160, 3)
    depths = jnp.asarray(msrd_data["depths"])
    K = jnp.asarray(msrd_data["intrinsics"])
    idx = [0, 1, 2, 1]
    return colors[:, idx], depths[:, idx], K


@pytest.mark.parametrize("assoc", ["projective", "knn"])
def test_pipelined_matches_serial(seq, assoc):
    rgb, dep, K = seq
    B, L, H, W, _ = rgb.shape
    cap = L * H * W
    opts = SLAMOptions(
        odom="gradicp", numiters=6, dsratio=4, fusion=True, assoc=assoc
    )
    m_ref, poses_ref = slam_sequence(rgb, dep, K, None, opts, cap)
    m_pp, poses_pp = pipelined_slam_sequence(
        rgb, dep, K, opts, cap, mesh=pipeline_mesh()
    )
    np.testing.assert_allclose(
        np.asarray(poses_pp), np.asarray(poses_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(m_pp.num_points), np.asarray(m_ref.num_points)
    )
    np.testing.assert_allclose(
        np.asarray(m_pp.data), np.asarray(m_ref.data), rtol=1e-5, atol=1e-4
    )


def test_pipeline_rejects_gt_and_short():
    rgb = jnp.zeros((1, 1, 8, 8, 3))
    dep = jnp.ones((1, 1, 8, 8, 1))
    K = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    with pytest.raises(ValueError):
        pipelined_slam_sequence(
            rgb, dep, K, SLAMOptions(odom="gt"), 64
        )
    with pytest.raises(ValueError):
        pipelined_slam_sequence(
            rgb, dep, K, SLAMOptions(odom="gradicp", fusion=True), 64
        )
