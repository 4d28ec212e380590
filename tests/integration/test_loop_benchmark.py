"""Long-horizon rendered loop benchmark (drift-visible length).

The closest zero-egress stand-in for the TUM fr1 ATE BASELINE row: a
100-frame 96x128 trajectory that revisits its start (a genuine loop),
with sensor-like smooth depth bias so odometry drift actually
accumulates (reference golden-clip strategy — /root/reference/tests/
common.py:20-39 — scaled to drift-visible length).

Pins the three claims the long-run story rests on:
  1. frame-to-frame odometry DRIFTS (the benchmark is not trivial),
  2. explicit loop closure recovers most of the end-of-loop drift,
  3. map-anchored PointFusion odometry stays near the closed accuracy
     WITHOUT explicit closure (re-association against the fused model
     re-anchors on revisit — implicit loop closure), and the managed
     lifecycle holds that accuracy at ~13x less capacity.

Reference numbers (this exact configuration, round 4): f2f ATE 10.7 mm /
end drift 28.6 mm; +lc 7.5 / 2.4; fusion 5.5 / 1.8; managed 5.6 / 3.8.
Bounds below carry ~2x headroom against cross-machine fusion-order
differences.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.datasets.synth import render_loop_sequence
from gradslam_tpu.metrics import ate_rmse
from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence
from gradslam_tpu.slam.lifecycle import slam_sequence_managed
from gradslam_tpu.slam.loopclosure import close_loops_rgbd

H, W, N = 96, 128, 100


@pytest.fixture(scope="module")
def loop_data():
    colors, depths, K, gt = render_loop_sequence(
        n_frames=N, H=H, W=W, radius=0.45, depth_noise=0.002
    )
    return (
        jnp.asarray(colors), jnp.asarray(depths), jnp.asarray(K), gt
    )


@pytest.fixture(scope="module")
def f2f_run(loop_data):
    rgb, dep, K, gt = loop_data
    opts = SLAMOptions(
        odom="gradicp", numiters=10, dsratio=4, fusion=False,
        odom_targets="recent",
    )
    _, p = slam_sequence(rgb, dep, K, None, opts, N * H * W)
    return p


def _ate(p, gt):
    return float(ate_rmse(jnp.asarray(np.asarray(p)[0]), jnp.asarray(gt[0])))


def _end_drift(p, gt):
    p = np.asarray(p)
    return float(np.linalg.norm(p[0, -1, :3, 3] - gt[0, -1, :3, 3]))


class TestLongHorizonLoop:
    def test_frame_to_frame_odometry_drifts(self, loop_data, f2f_run):
        *_, gt = loop_data
        drift = _end_drift(f2f_run, gt)
        # measured 28.6 mm; anything far below ~10 mm would mean the
        # benchmark stopped exercising drift at all
        assert drift > 0.010, drift
        assert _ate(f2f_run, gt) > 0.004

    def test_loop_closure_recovers_drift(self, loop_data, f2f_run):
        rgb, dep, K, gt = loop_data
        p_lc = close_loops_rgbd(
            rgb, dep, K, f2f_run, detection="pose",
            min_separation=N // 4, max_distance=0.36, icp_numiters=30,
        )
        d0, d1 = _end_drift(f2f_run, gt), _end_drift(p_lc, gt)
        # measured 28.6 -> 2.4 mm; require at least a 2x recovery
        assert d1 < 0.5 * d0, (d0, d1)
        assert _ate(p_lc, gt) < _ate(f2f_run, gt)

    def test_map_anchored_fusion_is_implicitly_loop_closed(
        self, loop_data, f2f_run
    ):
        rgb, dep, K, gt = loop_data
        opts = SLAMOptions(
            odom="gradicp", numiters=10, dsratio=4, fusion=True,
            assoc="projective", assoc_window=12 * H * W,
        )
        m, p = slam_sequence(rgb, dep, K, None, opts, 16 * H * W)
        assert int(jnp.max(m.num_points)) <= 12 * H * W
        # measured: ATE 5.5 mm vs f2f 10.7 mm; end drift 1.8 vs 28.6 mm
        assert _ate(p, gt) < 0.8 * _ate(f2f_run, gt)
        assert _end_drift(p, gt) < 0.35 * _end_drift(f2f_run, gt)

    def test_managed_lifecycle_holds_accuracy_at_small_capacity(
        self, loop_data, f2f_run
    ):
        rgb, dep, K, gt = loop_data
        # the loop ring at 1.5 cm voxels needs ~39k live points; cap
        # gives ~40% headroom while staying 3.6x below the unmanaged run
        cap = int(4.5 * H * W)
        opts = SLAMOptions(
            odom="gradicp", numiters=10, dsratio=4, fusion=True,
            assoc="projective", assoc_window=4 * H * W,
        )
        m, p = slam_sequence_managed(
            rgb, dep, K, None, opts, cap,
            watermark=0.6, segment_len=4, policy="voxel",
            voxel_size=0.015,
        )
        assert int(jnp.max(m.num_points)) < cap  # never saturated
        # measured 5.6 mm — within 2x of the full-capacity run, far
        # below the drifted f2f trajectory
        assert _ate(p, gt) < 0.8 * _ate(f2f_run, gt)


class TestScanNetResolutionLoop:
    """Long-horizon drift bound at SCANNET RESOLUTION (240x320) with the
    managed lifecycle — the operating point the lifecycle exists for
    (round-5 verdict item). Real-chip reference (120 frames, one v5e,
    tools/bench_loop.py --hw 240x320): managed ATE 12.9 mm / end drift
    3.5 mm at 229k live points in a 345k-row arena, while the UNMANAGED
    run grew to 1.23M points — overflowing even a 16*H*W association
    window, i.e. there is no valid unmanaged configuration at this
    resolution over a long run. This test runs the fused-lifecycle
    variant (one jitted program) at 32 frames to fit the CPU suite
    budget (measured ~36 s): CPU reference ATE 5.8 mm, map 156k/345k."""

    def test_managed_fused_drift_bounded_at_scannet_res(self):
        from gradslam_tpu.slam.lifecycle import slam_sequence_compacted

        Hs, Ws, Ns = 240, 320, 32
        colors, depths, K, gt = render_loop_sequence(
            n_frames=Ns, H=Hs, W=Ws, radius=0.55, depth_noise=0.002
        )
        rgb, dep, Kj = (
            jnp.asarray(colors), jnp.asarray(depths), jnp.asarray(K)
        )
        cap = int(4.5 * Hs * Ws)
        opts = SLAMOptions(
            odom="gradicp", numiters=8, dsratio=4, fusion=True,
            assoc="projective", assoc_window=4 * Hs * Ws,
        )
        m, p, peak = slam_sequence_compacted(
            rgb, dep, Kj, None, opts, cap,
            segment_len=4, policy="voxel", voxel_size=0.015,
        )
        pk = int(peak)
        assert pk <= 4 * Hs * Ws, pk  # association window never overflowed
        assert pk < cap, pk  # arena never saturated
        ate = _ate(p, gt)
        # measured 5.8 mm on CPU; 2.5x headroom for cross-machine
        # fusion-order drift
        assert ate < 0.015, ate
