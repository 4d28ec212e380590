"""Diagnostic: live-map growth + compaction yield at the ScanNet point.

Runs the managed segment loop by hand and prints, per segment boundary,
the live count before/after each candidate compaction policy — to size
watermark / segment_len / voxel so the live set stays under the
association window. Not part of the bench; a sizing tool.

Usage: python tools/diag_scannet_lifecycle.py [--voxels 0.005,0.01,0.02]
"""

import argparse
import pathlib
import sys


ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

from bench_scannet import load_sequence, B, L, NUMITERS, DSRATIO  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxels", default="0.005,0.01,0.02")
    ap.add_argument("--segment-len", type=int, default=4)
    ap.add_argument("--window", type=int, default=-1)
    args = ap.parse_args()
    voxels = [float(v) for v in args.voxels.split(",")]

    import jax.numpy as jnp

    from gradslam_tpu.slam.icpslam import (
        SLAMOptions, slam_init_state,
    )
    from gradslam_tpu.slam.lifecycle import _scan_segment, compact_slam_state
    from gradslam_tpu.structures.maparena import voxel_compact_map

    colors, depths, K = load_sequence()
    H, W = colors.shape[2], colors.shape[3]
    window = 4 * H * W if args.window < 0 else args.window
    capacity = L * H * W
    opts = SLAMOptions(
        odom="gradicp", numiters=NUMITERS, dsratio=DSRATIO, fusion=True,
        assoc="projective", assoc_window=window,
    )
    rgb, dep, Kj = jnp.asarray(colors), jnp.asarray(depths), jnp.asarray(K)

    state = slam_init_state(rgb[:, 0], dep[:, 0], Kj, opts, capacity, None)
    print(f"H={H} W={W} HW={H*W} window={window} cap={capacity}")
    print(f"frame 0: live={[int(x) for x in state.map_state.num_points]}")
    t = 1
    seg = args.segment_len
    while t < L:
        end = min(t + seg, L)
        state, _ = _scan_segment(
            state, rgb[:, t:end], dep[:, t:end], Kj,
            jnp.zeros((B, end - t, 4, 4), rgb.dtype), opts, False,
        )
        live = [int(x) for x in state.map_state.num_points]
        msg = f"after frames [{t},{end}): live={live}"
        for v in voxels:
            m = voxel_compact_map(state.map_state, v)
            msg += f" | voxel{v}={[int(x) for x in m.num_points]}"
        print(msg, flush=True)
        t = end
    # what a maintained compaction trajectory looks like: compact at every
    # boundary with the middle voxel size
    print("--- compact-every-boundary trajectory ---", flush=True)
    state = slam_init_state(rgb[:, 0], dep[:, 0], Kj, opts, capacity, None)
    t = 1
    while t < L:
        end = min(t + seg, L)
        state, _ = _scan_segment(
            state, rgb[:, t:end], dep[:, t:end], Kj,
            jnp.zeros((B, end - t, 4, 4), rgb.dtype), opts, False,
        )
        live = [int(x) for x in state.map_state.num_points]
        state = compact_slam_state(
            state, Kj, opts, H, W, policy="voxel", voxel_size=voxels[1],
        )
        after = [int(x) for x in state.map_state.num_points]
        print(f"[{t},{end}): live={live} -> compacted={after}", flush=True)
        t = end


if __name__ == "__main__":
    main()
