"""Accuracy scoreboard: ATE / RPE / reconstruction for every association
path, on the golden msrd clip at the bench operating point.

Pins mapping accuracy, not just trajectory: each path's fused map is
scored against the GT-FUSED map (fusion at ground-truth poses — the best
map this pipeline can produce) with chamfer distance and accuracy/
completeness at 1 cm, plus trajectory ATE-RMSE / RPE vs the ground-truth
poses and the max pose deviation vs the ACTUAL PyTorch reference's
recovered trajectory (tests/data/reference_goldens/).

Usage: python tools/scoreboard.py [--markdown]
(runs on CPU by default so it can run next to a busy TPU: --real to use
the attached backend).
"""

import argparse
import json
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

L = 10


def load_sequence():
    d = ROOT / "tests" / "data" / "msrd_b2s3"
    colors = np.load(d / "colors.npy").astype(np.float32)
    depths = np.load(d / "depths.npy").astype(np.float32)
    idx = [i % colors.shape[1] for i in range(L)]
    K = np.load(d / "intrinsics.npy").astype(np.float32)
    poses = np.load(d / "poses.npy").astype(np.float32)
    return colors[:, idx], depths[:, idx], K, poses[:, idx]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--real", action="store_true",
                    help="run on the attached backend instead of CPU")
    ap.add_argument("--loop", default="",
                    help="also run the long-horizon loop benchmark rows "
                    "(tools/bench_loop.py) at 'HxW:N', e.g. 240x320:120 "
                    "for the ScanNet-resolution long-run row")
    args = ap.parse_args()

    import jax

    if not args.real:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gradslam_tpu.metrics import ate_rmse, rpe
    from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence

    colors, depths, K, gt_poses = load_sequence()
    B, _, H, W, _ = colors.shape
    cap = L * H * W
    rgb, dep, Kj, gtp = (
        jnp.asarray(colors), jnp.asarray(depths), jnp.asarray(K),
        jnp.asarray(gt_poses),
    )

    # the GT-fused map: fusion at ground-truth poses = mapping oracle
    gt_map, _ = slam_sequence(
        rgb, dep, Kj, gtp, SLAMOptions(odom="gt", fusion=True), cap
    )
    gt_pts = [
        np.asarray(gt_map.points[b][: int(gt_map.num_points[b])])
        for b in range(B)
    ]

    def map_metrics(m):
        """Host-side (KD-tree) chamfer + accuracy/completeness at 1 cm —
        the on-device knn would need a (CAP, CAP) tile sweep at full
        arena size; exact host trees are fine for a scoreboard."""
        from scipy.spatial import cKDTree

        cham, acc, comp = 0.0, 1.0, 1.0
        for b in range(B):
            got = np.asarray(m.points[b][: int(m.num_points[b])])
            ref = gt_pts[b]
            d_mg = cKDTree(ref).query(got)[0]
            d_gm = cKDTree(got).query(ref)[0]
            cham = max(cham, float((d_mg**2).mean() + (d_gm**2).mean()))
            acc = min(acc, float((d_mg < 0.01).mean()))
            comp = min(comp, float((d_gm < 0.01).mean()))
        return cham, acc, comp

    ref_golden = None
    gpath = ROOT / "tests" / "data" / "reference_goldens"
    if (gpath / "pointfusion_gradicp.npz").exists():
        ref_golden = np.load(gpath / "pointfusion_gradicp.npz")["poses"]

    paths = {
        "knn (reference algorithm), exact": dict(assoc="knn", assoc_window=0),
        "knn + assoc_window": dict(assoc="knn", assoc_window=2 * H * W),
        "projective, exact": dict(assoc="projective", assoc_window=0),
        "projective + assoc_window (headline)": dict(
            assoc="projective", assoc_window=2 * H * W
        ),
    }

    rows = []
    for name, kw in paths.items():
        opts = SLAMOptions(odom="gradicp", numiters=20, dsratio=4,
                           fusion=True, **kw)
        m, p = slam_sequence(rgb, dep, Kj, None, opts, cap)
        p = np.asarray(p)
        ate = max(
            float(ate_rmse(jnp.asarray(p[b]), gtp[b])) for b in range(B)
        )
        rpe_t = max(
            float(rpe(jnp.asarray(p[b]), gtp[b])[0]) for b in range(B)
        )
        rpe_r = max(
            float(rpe(jnp.asarray(p[b]), gtp[b])[1]) for b in range(B)
        )
        cham, acc, comp = map_metrics(m)
        ref_dev = (
            float(np.abs(p - ref_golden).max())
            if ref_golden is not None
            else float("nan")
        )
        rows.append(
            dict(
                path=name, ate_rmse_m=ate, rpe_trans_m=rpe_t,
                rpe_rot_rad=rpe_r, chamfer_sq_m=cham,
                map_accuracy_1cm=acc,
                map_completeness_1cm=comp,
                vs_reference_max=ref_dev,
            )
        )

    if args.loop:
        # long-horizon rows (rendered revisiting loop at the requested
        # resolution — the ScanNet-res lifecycle operating point when
        # called with 240x320:120) via the loop benchmark harness
        import subprocess

        hw, n = args.loop.split(":")
        cmd = [
            sys.executable, str(ROOT / "tools" / "bench_loop.py"),
            "--hw", hw, "--frames", n, "--configs", "fusion,managed",
            "--fusion-window-mult", "16",
        ] + (["--real"] if args.real else [])
        out = subprocess.run(cmd, capture_output=True, text=True)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                r = json.loads(line)
                rows.append(
                    dict(
                        path=f"long-horizon {hw}:{n} {r['config']}",
                        ate_rmse_m=r["ate_rmse_m"],
                        rpe_trans_m=float("nan"),
                        rpe_rot_rad=float("nan"),
                        chamfer_sq_m=float("nan"),
                        map_accuracy_1cm=float("nan"),
                        map_completeness_1cm=float("nan"),
                        vs_reference_max=float("nan"),
                    )
                )

    if args.markdown:
        print(
            "| Path | ATE-RMSE (m) | RPE trans (m) | RPE rot (rad) | "
            "Chamfer (sq m) | Map acc@1cm | Map compl@1cm | "
            "vs reference (max pose dev) |"
        )
        print("|---|---|---|---|---|---|---|---|")
        for r in rows:
            print(
                f"| {r['path']} | {r['ate_rmse_m']:.2e} | "
                f"{r['rpe_trans_m']:.2e} | {r['rpe_rot_rad']:.2e} | "
                f"{r['chamfer_sq_m']:.2e} | {r['map_accuracy_1cm']:.4f} | "
                f"{r['map_completeness_1cm']:.4f} | "
                f"{r['vs_reference_max']:.2e} |"
            )
    else:
        for r in rows:
            print(json.dumps(r))


if __name__ == "__main__":
    main()
