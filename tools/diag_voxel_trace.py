"""Trace voxel_compact_map + refresh_slam_state at ScanNet scale.

Usage: python tools/diag_voxel_trace.py [--capacity 460800] [--trace DIR]
Then: python tools/profile_bench.py --parse_only --trace_dir DIR
"""

import argparse
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

from bench_scannet import load_sequence, B, NUMITERS, DSRATIO  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=460800)
    ap.add_argument("--voxel", type=float, default=0.01)
    ap.add_argument("--trace", default="/tmp/claude-0/voxel_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gradslam_tpu.slam.icpslam import SLAMOptions, slam_init_state
    from gradslam_tpu.slam.lifecycle import _scan_segment, refresh_slam_state
    from gradslam_tpu.structures.maparena import voxel_compact_map

    colors, depths, K = load_sequence()
    H, W = colors.shape[2], colors.shape[3]
    opts = SLAMOptions(
        odom="gradicp", numiters=NUMITERS, dsratio=DSRATIO, fusion=True,
        assoc="projective", assoc_window=4 * H * W,
    )
    rgb, dep, Kj = jnp.asarray(colors), jnp.asarray(depths), jnp.asarray(K)
    state = slam_init_state(rgb[:, 0], dep[:, 0], Kj, opts, args.capacity)
    state, _ = _scan_segment(
        state, rgb[:, 1:5], dep[:, 1:5], Kj,
        jnp.zeros((B, 4, 4, 4), rgb.dtype), opts, False,
    )
    float(state.map_state.num_points.sum())

    vc = jax.jit(lambda m: voxel_compact_map(m, args.voxel))
    rf = jax.jit(lambda s: refresh_slam_state(s, Kj, opts, H, W))
    m = vc(state.map_state)
    float(m.num_points.sum())
    s2 = rf(state)
    float(s2.pose.sum())

    jax.profiler.start_trace(args.trace)
    m = state.map_state
    for _ in range(3):
        m = vc(m)
    float(m.num_points.sum())
    s2 = state
    for _ in range(3):
        s2 = rf(s2)
    float(s2.pose.sum())
    jax.profiler.stop_trace()
    print("trace written to", args.trace)


if __name__ == "__main__":
    main()
