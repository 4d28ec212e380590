"""Benchmark: PointFusion SLAM throughput at the reference operating point.

Operating point (reference examples/pointfusion.py:46-56): 160x120 RGB-D,
seqlen 10, batch 2, dsratio 4, 20 gradICP iterations, PointFusion mapping.
Frames come from the real golden RGB-D clip (tests/data/msrd_b2s3, 120x160)
cycled to sequence length 10.

The reference publishes no numbers (BASELINE.md), so the baseline is
measured: the ACTUAL PyTorch reference (/root/reference, shimmed via
tools/refshims/ — see tools/run_reference.py) run on one CPU host at the
same operating point (the reference's own CI/examples target CPU torch).
The CPU number is cached in .bench_baseline.json after the first run.

The TPU headline uses this framework's projective-association fast path
(assoc='projective': O(S) association against the fused model image
instead of O(S*T) KNN) — same task, accuracy pinned to the KNN path by
tests/slam/test_slam.py::TestProjectiveAssociation (sub-2mm trajectory
error on the golden clip for both).

Measurement protocol: k independent timed batches; the value is the
MEDIAN batch, batches contaminated by backend stalls (>1.5x the fastest)
are discarded and re-run. Per-batch numbers ship in the JSON so the
artifact is auditable.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N,
   "batch_fps": [...], "discarded_batches": N, "cpu_baseline_fps": N}
"""

import json
import pathlib
import subprocess
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).parent
BASELINE_CACHE = ROOT / ".bench_baseline.json"

B, L = 2, 10
NUMITERS = 20
DSRATIO = 4
# Measurement = NBATCH independent timed batches of REPS_PER_BATCH reps
# each; the reported value is the MEDIAN batch. A batch slower than
# STALL_FACTOR x the fastest batch is treated as contaminated (remote
# backend stall / re-compile / tunnel hiccup) and re-run, up to
# MAX_BATCHES total. Rationale: a single long timed loop lets one
# mid-measurement backend stall poison the whole artifact (observed:
# driver captured 374 fps on a commit that steadily measures ~476).
REPS_PER_BATCH = 5
NBATCH = 5
MAX_BATCHES = 12
STALL_FACTOR = 1.5


def load_sequence():
    d = ROOT / "tests" / "data" / "msrd_b2s3"
    colors = np.load(d / "colors.npy")  # (2, 3, 120, 160, 3)
    depths = np.load(d / "depths.npy")
    idx = [i % colors.shape[1] for i in range(L)]
    colors = colors[:, idx]
    depths = depths[:, idx]
    K = np.load(d / "intrinsics.npy")
    return colors.astype(np.float32), depths.astype(np.float32), K.astype(np.float32)


def _measure_fn(fn, args, frames_per_rep, nbatch=NBATCH,
                reps_per_batch=REPS_PER_BATCH):
    """Shared measurement protocol: adaptive warmup, async batched
    dispatch with one sync fetch per batch, stall-contaminated batches
    discarded and re-run (see module docstring)."""
    import time as _time

    # Warm up until the per-rep wall time stabilizes. On a remote backend
    # the first executions pay the remote binary compile/load, and a fixed
    # two-shot warmup has been observed to leak that into the timed loop
    # (one cold run measured 19 fps vs 295 steady-state). Stop when a rep
    # is no faster than 70% of the previous one.
    prev = None
    for _ in range(8):
        t = _time.perf_counter()
        float(fn(*args))
        dt_w = _time.perf_counter() - t
        if prev is not None and dt_w > 0.7 * prev:
            break
        prev = dt_w

    def timed_batch():
        t0 = _time.perf_counter()
        outs = [fn(*args) for _ in range(reps_per_batch)]
        acc = outs[0]
        for s in outs[1:]:
            acc = acc + s
        float(acc)
        return (_time.perf_counter() - t0) / reps_per_batch

    clean, all_times = [], []
    while len(clean) < nbatch and len(all_times) < MAX_BATCHES:
        dt = timed_batch()
        all_times.append(dt)
        fastest = min(all_times)
        clean = [t for t in all_times if t <= STALL_FACTOR * fastest]
    batch_fps = sorted(frames_per_rep / t for t in clean)
    return {
        "fps": float(np.median(batch_fps)),
        "batch_fps": [round(f, 1) for f in batch_fps],
        "discarded_batches": len(all_times) - len(clean),
    }


def run_scannet_point(nbatch=3):
    """ScanNet operating point (240x320, L=16, CAP ~ 1.2M) — the
    large-arena regime; see tools/bench_scannet.py for the full harness.

    Configuration (round 5): projective assoc, dense window merge,
    assoc_window = 3*H*W and active_capacity = 1.5*H*W — verified
    BIT-IDENTICAL (map checksum and poses) to the conservative
    4*H*W / 2*H*W configuration on the chip, because gated compaction
    keeps every candidate that can win (measured peaks: live 209.7k vs
    the 230.4k window, gated 91.7k vs the 115.2k buffer; margins ~10%
    and ~26%). Guards below certify exactness per run: the window
    overflow check AND a pose-accuracy check against the cycled golden
    poses (the clip cycles 3 golden frames, so the fixture's poses
    cycle too)."""
    import importlib.util

    import jax
    import jax.numpy as jnp

    from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence

    spec = importlib.util.spec_from_file_location(
        "bench_scannet", ROOT / "tools" / "bench_scannet.py"
    )
    bs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bs)
    colors, depths, K = bs.load_sequence()
    H, W = colors.shape[2], colors.shape[3]
    window = 3 * H * W
    opts = SLAMOptions(
        odom="gradicp", numiters=bs.NUMITERS, dsratio=bs.DSRATIO,
        fusion=True, assoc="projective", assoc_window=window,
        active_capacity=(3 * H * W) // 2,
    )
    capacity = bs.L * H * W
    rgb, dep, Kj = jnp.asarray(colors), jnp.asarray(depths), jnp.asarray(K)

    def _run(r, d, k):
        m, poses = slam_sequence(r, d, k, None, opts, capacity)
        overflow = jnp.max(m.num_points) > window
        return poses.sum() + m.points.sum(), overflow, poses

    fn = jax.jit(_run)
    _, overflow, poses = fn(rgb, dep, Kj)
    assert not bool(overflow), "scannet point: map outgrew assoc_window"
    gt = np.load(
        ROOT / "tests" / "data" / "msrd_b2s3" / "poses.npy"
    ).astype(np.float32)
    gt = gt[:, [i % gt.shape[1] for i in range(bs.L)]]
    terr = np.linalg.norm(
        np.asarray(poses)[..., :3, 3] - gt[..., :3, 3], axis=-1
    )
    assert terr.max() < 0.01, f"scannet point accuracy guard: {terr.max()}"
    return _measure_fn(
        lambda *a: fn(*a)[0], (rgb, dep, Kj), bs.B * bs.L, nbatch=nbatch
    )


def run_train_point(nbatch=3):
    """Differentiable training step: forward + backward through the full
    10-frame scan — gradient of a pose loss w.r.t. ALL depth maps (the
    reference's headline use-case, end-to-end differentiable SLAM)."""
    import jax
    import jax.numpy as jnp

    from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence

    colors, depths, K = load_sequence()
    H, W = colors.shape[2], colors.shape[3]
    opts = SLAMOptions(
        odom="gradicp", numiters=NUMITERS, dsratio=DSRATIO, fusion=True,
        assoc="projective", assoc_window=2 * H * W,
    )
    capacity = L * H * W
    rgb, dep, Kj = jnp.asarray(colors), jnp.asarray(depths), jnp.asarray(K)

    def loss(d, r, k):
        _, poses = slam_sequence(r, d, k, None, opts, capacity)
        return jnp.sum(poses[..., :3, 3] ** 2)

    g = jax.jit(jax.grad(loss))
    return _measure_fn(
        lambda d, r, k: g(d, r, k).sum(), (dep, rgb, Kj), B * L,
        nbatch=nbatch,
    )


def run_pipeline(assoc="projective", assoc_window=True, fusion=True,
                 nbatch=NBATCH, window_mult=2):
    import jax
    import jax.numpy as jnp

    from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence

    colors, depths, K = load_sequence()
    H, W = colors.shape[2], colors.shape[3]
    # assoc_window bounds the association working set to the arena prefix
    # [0, 2*H*W) — cost then scales with the actual map size instead of
    # the worst-case capacity. Rows past the window would be excluded
    # from association (deterministic drop), so the run below VALIDATES
    # that the map never outgrows it (max num_points <= window) and the
    # result equals the unwindowed program; the headline is only reported
    # for a verified-exact configuration.
    window = window_mult * H * W if (assoc_window and fusion) else 0
    opts = SLAMOptions(
        odom="gradicp", numiters=NUMITERS, dsratio=DSRATIO, fusion=fusion,
        assoc=assoc if fusion else "knn", assoc_window=window,
    )
    capacity = L * H * W
    rgb = jnp.asarray(colors)
    dep = jnp.asarray(depths)
    Kj = jnp.asarray(K)

    # Return a scalar checksum and synchronize by fetching it to host:
    # device_get is the only reliable sync point on every backend (some
    # remote backends treat block_until_ready as a no-op). The
    # window-overflow guard is a SEPARATE boolean output (not folded into
    # the checksum) so a NaN or large checksum can't masquerade as an
    # overflow.
    def _run(r, d, k):
        m, poses = slam_sequence(r, d, k, None, opts, capacity)
        overflow = jnp.max(m.num_points) > window if window else jnp.array(False)
        return poses.sum() + m.points.sum(), overflow

    fn = jax.jit(_run)
    if window:
        _, overflow = fn(rgb, dep, Kj)
        assert not bool(overflow), (
            "map outgrew assoc_window — headline invalid; rerun with "
            "assoc_window=False"
        )
    # Warm up until the per-rep wall time stabilizes. On a remote backend
    # the first executions pay the remote binary compile/load, and a fixed
    # two-shot warmup has been observed to leak that into the timed loop
    # (one cold run measured 19 fps vs 295 steady-state). Stop when a rep
    # is no faster than 70% of the previous one.
    prev = None
    for _ in range(8):
        t = time.perf_counter()
        float(fn(rgb, dep, Kj)[0])
        dt_w = time.perf_counter() - t
        if prev is not None and dt_w > 0.7 * prev:
            break
        prev = dt_w

    # Throughput measurement: dispatch every rep of a batch asynchronously
    # and fetch ONE scalar at the end of the batch. Fetching per rep would
    # serialize a host<->device round-trip (a ~25 ms tunnel RTT on remote
    # backends) into every rep and measure dispatch latency, not device
    # throughput (CLAUDE.md: microbench pitfall). Reduce AFTER the dispatch
    # loop: even an async scalar add interleaved between dispatches costs
    # ~20 ms/rep on remote backends. The final fetch depends on all reps,
    # so the wall time still covers every frame processed.
    def timed_batch():
        t0 = time.perf_counter()
        outs = [fn(rgb, dep, Kj)[0] for _ in range(REPS_PER_BATCH)]
        acc = outs[0]
        for s in outs[1:]:
            acc = acc + s
        float(acc)
        return (time.perf_counter() - t0) / REPS_PER_BATCH

    # k independent batches; a batch >STALL_FACTOR x the fastest so far is
    # contaminated (backend stall / recompile) — drop it and run another,
    # bounded by MAX_BATCHES total attempts.
    clean, all_times = [], []
    while len(clean) < nbatch and len(all_times) < MAX_BATCHES:
        dt = timed_batch()
        all_times.append(dt)
        fastest = min(all_times)
        clean = [t for t in all_times if t <= STALL_FACTOR * fastest]
    batch_fps = sorted((B * L) / t for t in clean)
    discarded = len(all_times) - len(clean)
    return {
        "fps": float(np.median(batch_fps)),
        "batch_fps": [round(f, 1) for f in batch_fps],
        "discarded_batches": discarded,
    }


def measure_cpu_baseline():
    """Measures the ACTUAL PyTorch reference on CPU (cached).

    tools/run_reference.py runs /root/reference's PointFusion+gradICP
    (open3d/kornia/chamferdist shimmed — the numerical path is entirely
    the reference's own code) on the identical clip and operating point,
    so vs_baseline reads "our TPU build vs the real reference on the
    reference's own CI hardware (CPU torch)".
    """
    if BASELINE_CACHE.exists():
        return json.loads(BASELINE_CACHE.read_text())["cpu_frames_per_sec"]
    try:
        out = subprocess.run(
            [sys.executable, str(ROOT / "tools" / "run_reference.py"), "bench"],
            capture_output=True,
            text=True,
            cwd=ROOT,
            timeout=3600,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                rec = json.loads(line)
                fps = rec["value"]
                BASELINE_CACHE.write_text(
                    json.dumps(
                        {
                            "cpu_frames_per_sec": fps,
                            "source": "pytorch reference via tools/run_reference.py",
                            "runtimes_s": rec.get("runtimes_s"),
                        }
                    )
                )
                return fps
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
    except Exception as e:  # pragma: no cover
        sys.stderr.write(f"baseline measurement failed: {e}\n")
    return None


def main():
    res = run_pipeline()
    fps = res["fps"]
    cpu_fps = measure_cpu_baseline()
    vs = fps / cpu_fps if cpu_fps else float("nan")
    # secondary operating points (3 clean batches each): the
    # reference-identical KNN association, the exact full-arena
    # association, the aggregate (ICPSLAM) pipeline, the ScanNet-scale
    # point (240x320/L=16/1.2M arena), and the differentiable train step
    # (fwd+bwd through the scan) — so each round's artifact captures the
    # whole matrix and a regression on any path is localized for free.
    secondary = {}
    for key, runner in (
        ("knn_window_fps",
         lambda: run_pipeline(nbatch=3, assoc="knn", assoc_window=True)),
        ("exact_fps",
         lambda: run_pipeline(nbatch=3, assoc="projective",
                              assoc_window=False)),
        ("aggregate_fps", lambda: run_pipeline(nbatch=3, fusion=False)),
        ("scannet_fps", lambda: run_scannet_point(nbatch=3)),
        ("train_fps", lambda: run_train_point(nbatch=3)),
    ):
        try:
            secondary[key] = runner()["fps"]
        except Exception as e:  # pragma: no cover - keep headline alive
            sys.stderr.write(f"secondary point {key} failed: {e}\n")
            secondary[key] = None
    print(
        json.dumps(
            {
                "metric": "pointfusion_gradicp_frames_per_sec_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s/chip",
                "vs_baseline": round(vs, 3) if vs == vs else None,
                "batch_fps": res["batch_fps"],
                "discarded_batches": res["discarded_batches"],
                "cpu_baseline_fps": cpu_fps,
                **{
                    k: (round(v, 1) if v else None)
                    for k, v in secondary.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
