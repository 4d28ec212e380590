"""Microbench: per-call cost of the lifecycle components at ScanNet scale.

Times (chained, single fetch at end — CLAUDE.md microbench rules):
  - voxel_compact_map on a (B, CAP, 12) arena
  - refresh_slam_state (projection + compact_masked + 2 segment_mins)
  - a segment_len-frame inner scan (the baseline per-frame cost)

Usage: python tools/diag_compact_cost.py [--capacity 460800]
"""

import argparse
import pathlib
import sys
import time


ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

from bench_scannet import load_sequence, B, NUMITERS, DSRATIO  # noqa: E402


def timed(label, fn, state0, n=8):
    """Times n INDEPENDENT dispatches of fn(state0), one fetch at the end.

    Independent (not chained output->input): ops like voxel compaction
    are much slower on their own (already-compacted) output — degenerate
    sort keys — which made chained timings unrepresentative (measured
    1.3 s/call chained vs ~30 ms in a realistic pipeline). Dispatches
    queue on the single device stream, so wall/n is still device time.
    """
    s = fn(state0)  # warm 1 (compile)
    s = fn(state0)  # warm 2 (remote load)
    sync(s)
    t0 = time.perf_counter()
    outs = [fn(state0) for _ in range(n)]
    sync(outs[-1])
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.2f} ms/call", flush=True)
    return dt


def sync(tree):
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    float(leaves[0].sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=460800)
    ap.add_argument("--segment-len", type=int, default=4)
    ap.add_argument("--voxel", type=float, default=0.01)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gradslam_tpu.slam.icpslam import SLAMOptions, slam_init_state
    from gradslam_tpu.slam.lifecycle import _scan_segment, refresh_slam_state
    from gradslam_tpu.structures.maparena import voxel_compact_map

    colors, depths, K = load_sequence()
    H, W = colors.shape[2], colors.shape[3]
    window = 4 * H * W
    opts = SLAMOptions(
        odom="gradicp", numiters=NUMITERS, dsratio=DSRATIO, fusion=True,
        assoc="projective", assoc_window=window,
    )
    rgb, dep, Kj = jnp.asarray(colors), jnp.asarray(depths), jnp.asarray(K)

    state = slam_init_state(rgb[:, 0], dep[:, 0], Kj, opts, args.capacity)
    # grow the map to a realistic boundary state (one segment of frames)
    seg = args.segment_len
    state, _ = _scan_segment(
        state, rgb[:, 1:1 + seg], dep[:, 1:1 + seg], Kj,
        jnp.zeros((B, seg, 4, 4), rgb.dtype), opts, False,
    )
    sync(state.map_state.num_points)
    print(f"boundary live: {[int(x) for x in state.map_state.num_points]}"
          f" cap={args.capacity}", flush=True)

    vc = jax.jit(lambda m: voxel_compact_map(m, args.voxel))
    timed("voxel_compact_map", vc, state.map_state)

    rf = jax.jit(
        lambda s: refresh_slam_state(s, Kj, opts, H, W),
        static_argnames=(),
    )
    timed("refresh_slam_state", rf, state)

    def seg_fn(s):
        s2, _ = _scan_segment(
            s, rgb[:, 1:1 + seg], dep[:, 1:1 + seg], Kj,
            jnp.zeros((B, seg, 4, 4), rgb.dtype), opts, False,
        )
        return s2

    dt = timed(f"{seg}-frame segment scan", seg_fn, state)
    print(f"  = {dt*1e3/seg:.2f} ms/frame-batch", flush=True)

    def both(s):
        s2 = rf(s._replace(map_state=vc(s.map_state)))
        return seg_fn(s2)

    dt = timed("compact+refresh+segment", both, state)
    print(f"  = {dt*1e3/seg:.2f} ms/frame-batch amortized", flush=True)


if __name__ == "__main__":
    main()
