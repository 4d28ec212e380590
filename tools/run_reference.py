"""Runs the ACTUAL PyTorch reference (/root/reference) on the golden msrd
clip at the bench operating point, to produce (a) ground-truth oracle
outputs for parity tests and (b) an honest measured torch-CPU baseline.

The reference needs open3d / kornia / chamferdist / plotly, which are not
installed here; tools/refshims/ provides faithful minimal shims for exactly
the pieces the SLAM math touches (two kornia SE(3) helpers and a
brute-force exact `knn_points`) plus import-only stubs for the viz
dependencies. Everything numerical runs the reference's own code.

Operating point (mirrors bench.py and /root/reference/examples/
pointfusion.py:46-56): the msrd_b2s3 clip (B=2, 120x160) cycled to L=10,
PointFusion(odom=..., dsratio=4, numiters=20), no input poses (frame 0 =
identity, /root/reference/gradslam/slam/icpslam.py:127-132).

Usage:
  python tools/run_reference.py goldens   # write tests/data/reference_goldens/
  python tools/run_reference.py bench     # measure CPU fps -> stdout JSON
"""

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
SHIMS = ROOT / "tools" / "refshims"
REFERENCE = pathlib.Path("/root/reference")
OUT_DIR = ROOT / "tests" / "data" / "reference_goldens"

B, L = 2, 10
DSRATIO = 4
NUMITERS = 20


def _import_reference():
    for p in (str(SHIMS), str(REFERENCE)):
        if p not in sys.path:
            sys.path.insert(0, p)
    import gradslam  # noqa: F401  (the REFERENCE package)

    return gradslam


def load_sequence():
    """Same frames bench.py uses: golden clip cycled to L frames."""
    d = ROOT / "tests" / "data" / "msrd_b2s3"
    colors = np.load(d / "colors.npy")  # (2, 3, 120, 160, 3)
    depths = np.load(d / "depths.npy")  # (2, 3, 120, 160, 1)
    idx = [i % colors.shape[1] for i in range(L)]
    K = np.load(d / "intrinsics.npy")  # (2, 1, 4, 4)
    poses = np.load(d / "poses.npy")  # (2, 3, 4, 4)
    return (
        colors[:, idx].astype(np.float32),
        depths[:, idx].astype(np.float32),
        K.astype(np.float32),
        poses[:, idx].astype(np.float32),
    )


def run_reference_slam(odom="gradicp", with_poses=False):
    import torch

    from gradslam.slam.pointfusion import PointFusion
    from gradslam.structures.rgbdimages import RGBDImages

    colors, depths, K, poses = load_sequence()
    rgbd = RGBDImages(
        torch.from_numpy(colors),
        torch.from_numpy(depths),
        torch.from_numpy(K),
        torch.from_numpy(poses) if (with_poses or odom == "gt") else None,
        channels_first=False,
    )
    slam = PointFusion(odom=odom, dsratio=DSRATIO, numiters=NUMITERS)
    t0 = time.perf_counter()
    pointclouds, recovered = slam(rgbd)
    dt = time.perf_counter() - t0
    return pointclouds, recovered, dt


def write_goldens():
    _import_reference()
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    meta = {"B": B, "L": L, "dsratio": DSRATIO, "numiters": NUMITERS}
    for odom in ("gradicp", "icp", "gt"):
        pc, recovered, dt = run_reference_slam(odom)
        num_points = np.asarray(pc.num_points_per_pointcloud)
        pts = pc.points_padded.detach().numpy()
        normals = pc.normals_padded.detach().numpy()
        colors = pc.colors_padded.detach().numpy()
        ccounts = pc.features_padded.detach().numpy()
        np.savez_compressed(
            OUT_DIR / f"pointfusion_{odom}.npz",
            poses=recovered.detach().numpy(),
            num_points=num_points,
            points=pts.astype(np.float32),
            normals=normals.astype(np.float32),
            colors=colors.astype(np.float32),
            ccounts=ccounts.astype(np.float32),
        )
        meta[f"{odom}_num_points"] = num_points.tolist()
        meta[f"{odom}_runtime_s"] = round(dt, 3)
        print(f"{odom}: num_points={num_points.tolist()} runtime={dt:.1f}s")
    (OUT_DIR / "meta.json").write_text(json.dumps(meta, indent=1))
    print(f"goldens written to {OUT_DIR}")


def bench(reps=3):
    """Measured CPU fps of the reference PointFusion+gradICP pipeline."""
    _import_reference()
    times = []
    for _ in range(reps):
        _, _, dt = run_reference_slam("gradicp")
        times.append(dt)
    best = min(times)
    fps = (B * L) / best
    print(
        json.dumps(
            {
                "metric": "reference_pointfusion_gradicp_cpu_frames_per_sec",
                "value": round(fps, 4),
                "unit": "frames/s",
                "runtimes_s": [round(t, 3) for t in times],
            }
        )
    )
    return fps


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "goldens"
    if mode == "goldens":
        write_goldens()
    elif mode == "bench":
        bench()
    else:
        raise SystemExit(f"unknown mode {mode!r} (use: goldens | bench)")
