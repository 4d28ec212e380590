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
    ap.add_argument("--fps", action="store_true",
                    help="re-run each config once more (programs warm) "
                    "and report steady-state frames/s")
    ap.add_argument("--configs",
                    default="f2f,f2f+lc,fusion,managed,managed-fused",
                    help="comma-separated subset of configs to run")
    ap.add_argument("--fusion-window-mult", type=int, default=12,
                    help="fusion config assoc_window as a multiple of "
                    "H*W (capacity is mult+4)")
    args = ap.parse_args()
    which = set(args.configs.split(","))

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

    def add(name, runner, extra_fn=None):
        if name not in which:
            return None
        t0 = time.time()
        p, extra = runner()
        secs = time.time() - t0
        row = dict(config=name)
        if args.fps:
            # steady-state pass: programs compiled, one more full run
            t0 = time.time()
            p, extra = runner()
            float(jnp.asarray(p).sum())
            row["fps"] = round(N / (time.time() - t0), 1)
        ate, end = score(p)
        row.update(
            ate_rmse_m=round(ate, 6), end_drift_m=round(end, 6),
            runtime_s=round(secs, 1), **(extra or {}),
        )
        rows.append(row)
        return p

    # (a) frame-to-frame odometry
    f2f_opts = SLAMOptions(
        odom="gradicp", numiters=args.numiters, dsratio=4,
        fusion=False, odom_targets="recent",
    )
    p_f2f = add(
        "f2f",
        lambda: (
            slam_sequence(rgb, dep, Kj, None, f2f_opts, N * H * W)[1], None
        ),
    )

    # (b) explicit loop closure on the drifted trajectory
    if p_f2f is not None:
        add(
            "f2f+lc",
            lambda: (
                close_loops_rgbd(
                    rgb, dep, Kj, p_f2f, detection="pose",
                    min_separation=N // 4, max_distance=args.radius * 0.8,
                    icp_numiters=30,
                ),
                None,
            ),
        )

    # (c) map-anchored PointFusion (implicit loop closure on revisit)
    fw = args.fusion_window_mult
    fus_opts = SLAMOptions(
        odom="gradicp", numiters=args.numiters, dsratio=4, fusion=True,
        assoc="projective", assoc_window=fw * H * W,
    )

    def run_fusion():
        m, p = slam_sequence(rgb, dep, Kj, None, fus_opts, (fw + 4) * H * W)
        mp = int(jnp.max(m.num_points))
        # overflow is REPORTED, not raised: association dropped rows past
        # the window, so the row's accuracy is tagged invalid — rerun with
        # a larger --fusion-window-mult for an exact number
        return p, dict(
            map_points=mp, capacity=(fw + 4) * H * W,
            window_overflow=mp > fw * H * W,
        )

    add("fusion", run_fusion)

    # (d) fusion + managed lifecycle at a much smaller capacity
    man_opts = SLAMOptions(
        odom="gradicp", numiters=args.numiters, dsratio=4, fusion=True,
        assoc="projective", assoc_window=4 * H * W,
    )

    def run_managed():
        mm, p = slam_sequence_managed(
            rgb, dep, Kj, None, man_opts, int(4.5 * H * W),
            watermark=0.6, segment_len=4, policy="voxel", voxel_size=0.015,
        )
        mp = int(jnp.max(mm.num_points))
        return p, dict(
            map_points=mp, capacity=int(4.5 * H * W),
            window_overflow=mp > 4 * H * W,
        )

    add("managed", run_managed)

    # (e) fused lifecycle: same policy, but compaction runs INSIDE one
    # compiled scan-of-scans — no per-segment host sync/dispatch (the
    # remote-backend dispatch costs ~25-45 ms per segment, which at
    # segment_len=4 caps the host-segmented variant near ~50 fps)
    def run_managed_fused():
        from gradslam_tpu.slam.lifecycle import slam_sequence_compacted

        mm, p, peak = slam_sequence_compacted(
            rgb, dep, Kj, None, man_opts, int(4.5 * H * W),
            segment_len=4, policy="voxel", voxel_size=0.015,
        )
        pk = int(peak)
        return p, dict(
            map_points=pk, capacity=int(4.5 * H * W),
            window_overflow=pk > 4 * H * W,
        )

    add("managed-fused", run_managed_fused)

    if args.markdown:
        print(f"\nLoop benchmark: {N} frames {H}x{W}, depth bias "
              f"{args.noise:.3f}, radius {args.radius} m")
        fps_col = " FPS |" if args.fps else ""
        print(f"| Config | ATE-RMSE (mm) | End drift (mm) | Runtime (s) |"
              f"{fps_col}")
        print("|---|---|---|---|" + ("---|" if args.fps else ""))
        for r in rows:
            fps_cell = f" {r['fps']} |" if args.fps else ""
            extras = []
            if "map_points" in r:
                extras.append(f"map {r['map_points']}/{r['capacity']}")
            if r.get("window_overflow"):
                extras.append("WINDOW OVERFLOW (accuracy invalid)")
            tail = (" " + "; ".join(extras)) if extras else ""
            print(
                f"| {r['config']} | {r['ate_rmse_m']*1e3:.2f} | "
                f"{r['end_drift_m']*1e3:.2f} | {r['runtime_s']} |{fps_cell}"
                f"{tail}"
            )
    else:
        for r in rows:
            print(json.dumps(r))


if __name__ == "__main__":
    main()
