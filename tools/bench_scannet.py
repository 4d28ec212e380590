"""ScanNet-operating-point benchmark (240x320, L=16, CAP = L*H*W ~ 1.2M).

Frames come from the golden msrd clip, nearest-upsampled 2x to 240x320 and
cycled to L=16 — same content statistics, ScanNet-example geometry
(reference examples/pointfusion_scannet.py: 320x240).

Usage:
    python tools/bench_scannet.py [--assoc projective|knn] [--window N]
        [--reps 5] [--trace DIR] [--capacity N] [--scatter|--merge-window N]

Defaults are the CONSERVATIVE configuration (window 4*H*W, active
2*H*W, ~99 fps round 5). The shipped bench-matrix point (bench.py
scannet_fps, ~123 fps) is `--window 230400 --active 115200` — verified
bit-identical to the conservative run (gated compaction; see
docs/PERFORMANCE.md round-5 section). `--active 96000` measures ~133
but has only 4.4% margin over the measured gated peak.
"""

import argparse
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

B, L = 2, 16
NUMITERS = 20
DSRATIO = 4


def _bilinear2x(x):
    """2x bilinear upsample over axes (2, 3) of (B, L, H, W, C)."""
    B_, L_, H, W, C = x.shape
    xr = x.reshape(B_ * L_, H, W, C)
    # edge-aligned 2x: out[2i] = in[i], out[2i+1] = (in[i]+in[i+1])/2
    mid_r = 0.5 * (xr[:, :-1] + xr[:, 1:])
    rows = np.empty((B_ * L_, 2 * H, W, C), xr.dtype)
    rows[:, 0::2] = xr
    rows[:, 1:-1:2] = mid_r
    rows[:, -1] = xr[:, -1]
    mid_c = 0.5 * (rows[:, :, :-1] + rows[:, :, 1:])
    out = np.empty((B_ * L_, 2 * H, 2 * W, C), xr.dtype)
    out[:, :, 0::2] = rows
    out[:, :, 1:-1:2] = mid_c
    out[:, :, -1] = rows[:, :, -1]
    return out.reshape(B_, L_, 2 * H, 2 * W, C)


def load_sequence(H=240, W=320, upsample="bilinear"):
    """Synthesizes ScanNet-geometry frames (240x320, L=16) from the golden
    120x160 clip.

    upsample='bilinear' (default): smooth depth — a plausible stand-in
    for real 320x240 ScanNet content (well-defined normals, normal merge
    statistics). 'nearest': blocky 2x2-duplicated depth — an ADVERSARIAL
    variant whose degenerate in-block normals break both projective
    odometry and fusion merging (~75% of pixels append every frame, the
    map grows ~57k rows/frame) — the stress case for the arena-lifecycle
    paths (--managed/--fused-managed).
    """
    d = ROOT / "tests" / "data" / "msrd_b2s3"
    colors = np.load(d / "colors.npy")  # (2, 3, 120, 160, 3)
    depths = np.load(d / "depths.npy")
    idx = [i % colors.shape[1] for i in range(L)]
    colors, depths = colors[:, idx], depths[:, idx]
    if upsample == "bilinear":
        colors = _bilinear2x(colors)
        depths = _bilinear2x(depths)
    else:
        colors = colors.repeat(2, axis=2).repeat(2, axis=3)
        depths = depths.repeat(2, axis=2).repeat(2, axis=3)
    K = np.load(d / "intrinsics.npy").copy()
    K[:, :, :2] *= 2.0  # fx, fy, cx, cy scale with the upsample
    return (
        colors.astype(np.float32),
        depths.astype(np.float32),
        K.astype(np.float32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--assoc", default="projective")
    ap.add_argument("--window", type=int, default=-1,
                    help="assoc_window (-1 auto = 4*H*W, 0 off)")
    ap.add_argument("--merge-window", type=int, default=-1)
    ap.add_argument("--capacity", type=int, default=0, help="0 = L*H*W")
    ap.add_argument("--active", type=int, default=0,
                    help="active_capacity override (0 = default 2*H*W); "
                    "active rows past it are deterministically dropped "
                    "from association — the accuracy guard below still "
                    "applies")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--window-merge", default="dense",
                    choices=("dense", "rows"),
                    help="assoc_window merge formulation (A/B)")
    ap.add_argument("--trace", default="")
    ap.add_argument("--managed", action="store_true",
                    help="slam_sequence_managed: watermark voxel "
                    "compaction bounds the live map, so the assoc window "
                    "(and every active-set op) stays small AND capacity "
                    "can shrink to a small multiple of the working set "
                    "(--capacity) — per-capacity costs shrink with it")
    ap.add_argument("--fused-managed", action="store_true",
                    help="slam_sequence_compacted: ONE jitted program "
                    "that voxel-compacts unconditionally every "
                    "--segment-len frames — no host syncs or per-segment "
                    "dispatch (~25-45 ms each on a remote backend)")
    ap.add_argument("--upsample", default="bilinear",
                    choices=("bilinear", "nearest"),
                    help="depth upsampling for the synthesized frames: "
                    "bilinear = realistic smooth content (default); "
                    "nearest = adversarial blocky content (lifecycle "
                    "stress case)")
    ap.add_argument("--voxel", type=float, default=0.01)
    ap.add_argument("--segment-len", type=int, default=8)
    ap.add_argument("--watermark", type=float, default=0.0,
                    help="compaction trigger as a fraction of CAPACITY; "
                    "0 = auto: the worst-case-safe bound "
                    "(window - segment_len*H*W)/capacity, so even if "
                    "EVERY pixel of every segment frame appends the live "
                    "set cannot outgrow the association window")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence

    colors, depths, K = load_sequence(upsample=args.upsample)
    H, W = colors.shape[2], colors.shape[3]
    window = 4 * H * W if args.window < 0 else args.window
    capacity = args.capacity or L * H * W
    opts = SLAMOptions(
        odom="gradicp", numiters=NUMITERS, dsratio=DSRATIO, fusion=True,
        assoc=args.assoc, assoc_window=window,
        merge_window=args.merge_window,
        active_capacity=args.active or None,
        window_merge=args.window_merge,
    )
    rgb, dep, Kj = jnp.asarray(colors), jnp.asarray(depths), jnp.asarray(K)

    if args.fused_managed:
        from gradslam_tpu.slam.lifecycle import slam_sequence_compacted

        def fn(r, d, k):
            m, poses, peak = slam_sequence_compacted(
                r, d, k, None, opts, capacity,
                segment_len=args.segment_len,
                policy="voxel", voxel_size=args.voxel,
            )
            overflow = peak > window if window else jnp.array(False)
            return poses.sum() + m.points.sum(), overflow, peak, poses
    elif args.managed:
        from gradslam_tpu.slam.lifecycle import slam_sequence_managed

        # compact when a worst-case segment (every pixel appends) could
        # outgrow the association window; the bench's overflow assert
        # below still certifies exactness after the fact
        wm = args.watermark or min(
            0.95,
            max(1e-6, ((window or capacity) - args.segment_len * H * W)
                / capacity),
        )

        def fn(r, d, k):
            m, poses = slam_sequence_managed(
                r, d, k, None, opts, capacity,
                watermark=wm,
                segment_len=args.segment_len,
                policy="voxel", voxel_size=args.voxel,
            )
            overflow = (
                jnp.max(m.num_points) > window if window
                else jnp.array(False)
            )
            return (
                poses.sum() + m.points.sum(), overflow,
                jnp.max(m.num_points), poses,
            )
    else:
        def _run(r, d, k):
            m, poses = slam_sequence(r, d, k, None, opts, capacity)
            overflow = (
                jnp.max(m.num_points) > window if window
                else jnp.array(False)
            )
            return (
                poses.sum() + m.points.sum(), overflow,
                jnp.max(m.num_points), poses,
            )

        fn = jax.jit(_run)
    chk, overflow, maxnp, poses = fn(rgb, dep, Kj)
    print(f"max num_points: {int(maxnp)} (window {window}, cap {capacity})")
    assert not bool(overflow), "map outgrew assoc_window"
    # accuracy guard: the clip cycles 3 golden frames, so the fixture's
    # poses cycle too — every configuration must stay within a few mm of
    # them or its fps number is meaningless
    gt = np.load(ROOT / "tests" / "data" / "msrd_b2s3" / "poses.npy")
    gt = gt[:, [i % gt.shape[1] for i in range(L)]].astype(np.float32)
    terr = np.linalg.norm(
        np.asarray(poses)[..., :3, 3] - gt[..., :3, 3], axis=-1
    )
    print(f"max pose error vs cycled gt: {terr.max()*1e3:.2f} mm")

    prev = None
    for _ in range(8):
        t = time.perf_counter()
        float(fn(rgb, dep, Kj)[0])
        dt_w = time.perf_counter() - t
        if prev is not None and dt_w > 0.7 * prev:
            break
        prev = dt_w

    if args.trace:
        jax.profiler.start_trace(args.trace)
        float(fn(rgb, dep, Kj)[0])
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}")

    t0 = time.perf_counter()
    outs = [fn(rgb, dep, Kj)[0] for _ in range(args.reps)]
    acc = outs[0]
    for s in outs[1:]:
        acc = acc + s
    float(acc)
    dt = (time.perf_counter() - t0) / args.reps
    fps = (B * L) / dt
    print(
        f"scannet point ({H}x{W}, L={L}, B={B}, cap={capacity}, "
        f"assoc={args.assoc}, window={window}): {fps:.1f} frames/s/chip "
        f"({dt * 1e3 / L:.2f} ms/frame-batch)"
    )


if __name__ == "__main__":
    main()
