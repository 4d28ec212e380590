"""Long-horizon loop benchmark: ATE over a 120-160-frame revisiting
trajectory (the zero-egress stand-in for the TUM fr1 BASELINE row).

Renders a synthetic RGB-D loop (gradslam_tpu.datasets.synth) with
sensor-like smooth depth bias, then reports ATE-RMSE / end-of-loop drift
for four pipeline configurations:

  f2f        frame-to-frame odometry (aggregate mapping,
             odom_targets='recent') — drift accumulates as a random walk.
  f2f+lc     the same trajectory after explicit loop closure
             (close_loops_rgbd: detect + ICP-verify + pose-graph).
  fusion     map-anchored PointFusion odometry (the flagship path) —
             odometry associates against the FUSED MODEL, so a revisit
             re-anchors to the old map and drift stays bounded WITHOUT
             explicit closure (implicit loop closure; measured round 4).
  managed    fusion + in-loop voxel lifecycle at a capacity ~13x smaller
             — the bounded-memory long-run configuration.

Usage: python tools/bench_loop.py [--frames 160] [--hw 120x160]
       [--noise 0.002] [--real] [--markdown]
(CPU by default; --real uses the attached backend.)
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=160)
    ap.add_argument("--hw", default="120x160")
    ap.add_argument("--noise", type=float, default=0.002)
    ap.add_argument("--radius", type=float, default=0.55)
    ap.add_argument("--numiters", type=int, default=10)
    ap.add_argument("--real", action="store_true")
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.real:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gradslam_tpu.datasets.synth import render_loop_sequence
    from gradslam_tpu.metrics import ate_rmse
    from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence
    from gradslam_tpu.slam.lifecycle import slam_sequence_managed
    from gradslam_tpu.slam.loopclosure import close_loops_rgbd

    H, W = (int(x) for x in args.hw.split("x"))
    N = args.frames
    colors, depths, K, gt = render_loop_sequence(
        n_frames=N, H=H, W=W, radius=args.radius, depth_noise=args.noise
    )
    rgb, dep, Kj = jnp.asarray(colors), jnp.asarray(depths), jnp.asarray(K)
    gtj = jnp.asarray(gt)

    def score(p):
        p = np.asarray(p)
        ate = float(ate_rmse(jnp.asarray(p[0]), gtj[0]))
        end = float(np.linalg.norm(p[0, -1, :3, 3] - gt[0, -1, :3, 3]))
        return ate, end

    rows = []

    def add(name, p, secs, extra=None):
        ate, end = score(p)
        rows.append(
            dict(
                config=name, ate_rmse_m=round(ate, 6),
                end_drift_m=round(end, 6), runtime_s=round(secs, 1),
                **(extra or {}),
            )
        )

    # (a) frame-to-frame odometry
    f2f_opts = SLAMOptions(
        odom="gradicp", numiters=args.numiters, dsratio=4,
        fusion=False, odom_targets="recent",
    )
    t0 = time.time()
    _, p_f2f = slam_sequence(rgb, dep, Kj, None, f2f_opts, N * H * W)
    add("f2f", p_f2f, time.time() - t0)

    # (b) explicit loop closure on the drifted trajectory
    t0 = time.time()
    p_lc = close_loops_rgbd(
        rgb, dep, Kj, p_f2f, detection="pose",
        min_separation=N // 4, max_distance=args.radius * 0.8,
        icp_numiters=30,
    )
    add("f2f+lc", p_lc, time.time() - t0)

    # (c) map-anchored PointFusion (implicit loop closure on revisit)
    fus_opts = SLAMOptions(
        odom="gradicp", numiters=args.numiters, dsratio=4, fusion=True,
        assoc="projective", assoc_window=12 * H * W,
    )
    t0 = time.time()
    m, p_fus = slam_sequence(rgb, dep, Kj, None, fus_opts, 16 * H * W)
    assert int(jnp.max(m.num_points)) <= 12 * H * W, "assoc_window overflow"
    add("fusion", p_fus, time.time() - t0,
        dict(map_points=int(jnp.max(m.num_points))))

    # (d) fusion + managed lifecycle at a much smaller capacity
    man_opts = SLAMOptions(
        odom="gradicp", numiters=args.numiters, dsratio=4, fusion=True,
        assoc="projective", assoc_window=4 * H * W,
    )
    t0 = time.time()
    mm, p_man = slam_sequence_managed(
        rgb, dep, Kj, None, man_opts, int(4.5 * H * W),
        watermark=0.6, segment_len=4, policy="voxel", voxel_size=0.015,
    )
    add("managed", p_man, time.time() - t0,
        dict(map_points=int(jnp.max(mm.num_points)),
             capacity=int(4.5 * H * W)))

    if args.markdown:
        print(f"\nLoop benchmark: {N} frames {H}x{W}, depth bias "
              f"{args.noise:.3f}, radius {args.radius} m")
        print("| Config | ATE-RMSE (mm) | End drift (mm) | Runtime (s) |")
        print("|---|---|---|---|")
        for r in rows:
            print(
                f"| {r['config']} | {r['ate_rmse_m']*1e3:.2f} | "
                f"{r['end_drift_m']*1e3:.2f} | {r['runtime_s']} |"
            )
    else:
        for r in rows:
            print(json.dumps(r))


if __name__ == "__main__":
    main()
