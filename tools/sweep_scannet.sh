#!/bin/bash
# ScanNet operating-point sweep (run on the attached TPU, one config at a
# time — single-tenant). Usage: bash tools/sweep_scannet.sh [logfile]
set -u
LOG=${1:-/tmp/claude-0/scannet_sweep.log}
cd "$(dirname "$0")/.."
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 2400 python tools/bench_scannet.py "$@" 2>&1 \
    | grep -v WARNING | tee -a "$LOG"
}

# health gate: bail early if the backend is stalled
timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((1000, 1000)); float((x @ x).sum()); print('backend healthy')
" 2>&1 | grep -v WARNING | tee -a "$LOG"
grep -q "backend healthy" "$LOG" || { echo "BACKEND STALLED" | tee -a "$LOG"; exit 1; }

# 1. realistic content, exact unmanaged, window 5HW (live peaks ~307k)
run --upsample bilinear --window 384000 --reps 5
# 2. realistic content, fused-managed, small window (2HW) + small cap
run --upsample bilinear --fused-managed --segment-len 4 --voxel 0.005 \
    --window 153600 --capacity 307200 --reps 5
# 3. same, tighter voxel (accuracy/yield trade)
run --upsample bilinear --fused-managed --segment-len 4 --voxel 0.002 \
    --window 153600 --capacity 307200 --reps 5
# 4. adversarial content, fused-managed (the lifecycle stress row)
run --upsample nearest --fused-managed --segment-len 4 --voxel 0.01 \
    --capacity 460800 --reps 5
echo "sweep done" | tee -a "$LOG"
