"""Profiles the bench workload on the attached TPU and summarizes the trace.

Runs the same slam_sequence as bench.py under jax.profiler, then parses the
Perfetto trace.json.gz for per-HLO-fusion device times and prints the top-K
ops plus a stage aggregation. Usage:

    python tools/profile_bench.py [--topk 40]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def run_and_trace(trace_dir):
    import jax
    import jax.numpy as jnp

    import bench
    from gradslam_tpu.slam.icpslam import SLAMOptions, slam_sequence

    colors, depths, K = bench.load_sequence()
    H, W = colors.shape[2], colors.shape[3]
    opts = SLAMOptions(
        odom="gradicp", numiters=bench.NUMITERS, dsratio=bench.DSRATIO,
        fusion=True, assoc=os.environ.get("PROF_ASSOC", "projective"),
        assoc_window=int(os.environ.get("PROF_ASSOC_WINDOW", 2 * H * W)),
    )
    capacity = bench.L * colors.shape[2] * colors.shape[3]
    rgb, dep, Kj = jnp.asarray(colors), jnp.asarray(depths), jnp.asarray(K)

    def _run(r, d, k):
        m, poses = slam_sequence(r, d, k, None, opts, capacity)
        return poses.sum() + m.points.sum()

    fn = jax.jit(_run)
    float(fn(rgb, dep, Kj))  # compile + remote warmup
    float(fn(rgb, dep, Kj))
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        s = float(fn(rgb, dep, Kj))
    jax.profiler.stop_trace()
    return s


def load_trace_events(trace_dir):
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def summarize(events, topk):
    # keep only device-lane complete events (have dur) on TPU device tracks
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()
    }
    by_name = collections.Counter()
    calls = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if name.startswith(("Steps", "thread", "process")):
            continue
        by_name[name] += e["dur"]
        calls[name] += 1
        total += e["dur"]
    print(f"\ntotal device time: {total/1e3:.2f} ms over 3 reps "
          f"(pids={sorted(device_pids) or 'ALL'})")
    print(f"{'us_total':>10} {'calls':>6} {'us/call':>9}  name")
    for name, dur in by_name.most_common(topk):
        print(f"{dur:10.0f} {calls[name]:6d} {dur/calls[name]:9.1f}  {name[:110]}")
    return by_name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topk", type=int, default=40)
    ap.add_argument("--trace_dir", default="/tmp/gradslam_prof")
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        run_and_trace(args.trace_dir)
    events = load_trace_events(args.trace_dir)
    summarize(events, args.topk)


if __name__ == "__main__":
    main()
