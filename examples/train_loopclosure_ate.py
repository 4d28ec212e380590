"""Differentiable loop closure: train a sensor calibration against
post-loop-closure ATE.

The refinement stack (batched gradICP verification + pose-graph
Gauss-Newton, gradslam_tpu/slam/loopclosure.py) is differentiable end to
end, so a trajectory-level metric computed AFTER loop closure can
supervise upstream sensor parameters. Here a range-scale miscalibration
is applied to every frame's point cloud (depth sensor reporting ranges
scaled by an unknown factor); the loss is the ATE-RMSE of the
loop-closed trajectory against ground truth, and gradient descent
recovers the true scale:

    loss = ATE(close_loops(drifted_poses, s * points, ...), gt)
    ds = d loss / d s        # flows through GN + ICP + detection gates

Candidate selection (top_k) and accept thresholds are piecewise-constant
and act as locally-constant gates; the ICP measurements and the
pose-graph solve carry the gradient (see
tests/slam/test_refinement_grad.py).

    python examples/train_loopclosure_ate.py [--steps 25]
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from gradslam_tpu.geometry import se3_exp
from gradslam_tpu.metrics import ate_rmse
from gradslam_tpu.slam import close_loops

parser = argparse.ArgumentParser()
parser.add_argument("--frames", type=int, default=13)
parser.add_argument("--points", type=int, default=256)
parser.add_argument("--drift", type=float, default=0.02)
parser.add_argument("--true_scale", type=float, default=1.15)
parser.add_argument("--steps", type=int, default=25)
parser.add_argument("--lr", type=float, default=0.4)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

rng = np.random.RandomState(args.seed)
L, N = args.frames, args.points

# world cloud + circular trajectory closing on itself (as in
# examples/loop_closure.py)
world = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
world[:, 2] += 4.0
normals = rng.randn(N, 3).astype(np.float32)
normals /= np.linalg.norm(normals, axis=-1, keepdims=True)

true_poses, pts, nrms = [], [], []
for k in range(L):
    ang = 2 * np.pi * k / (L - 1)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = 0.2 * np.array([np.cos(ang) - 1.0, np.sin(ang), 0.0])
    true_poses.append(T)
    Tinv = np.linalg.inv(T)
    pts.append(world @ Tinv[:3, :3].T + Tinv[:3, 3])
    nrms.append(normals @ Tinv[:3, :3].T)
true_poses = np.stack(true_poses)

drifted = [true_poses[0]]
for k in range(1, L):
    inc = np.linalg.inv(true_poses[k - 1]) @ true_poses[k]
    xi = rng.randn(6).astype(np.float32) * args.drift
    drifted.append(drifted[-1] @ (np.asarray(se3_exp(jnp.asarray(xi))) @ inc))
drifted = jnp.asarray(np.stack(drifted).astype(np.float32))

gt = jnp.asarray(true_poses)
valid = jnp.ones((L, N), bool)
nrm_j = jnp.asarray(np.stack(nrms))
# the "sensor" reports ranges divided by the unknown true scale
pts_observed = jnp.asarray(np.stack(pts)) / args.true_scale


def loss_fn(log_s):
    s = jnp.exp(log_s)
    refined, _, w = close_loops(
        drifted, s * pts_observed, nrm_j, valid,
        max_candidates=8, min_separation=max(3, L // 3), max_distance=0.3,
        icp_numiters=8, refine_iters=5,
    )
    return ate_rmse(refined, gt, align=False), w


grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

log_s = jnp.zeros(())  # scale 1.0
for step in range(args.steps):
    (loss, w), g = grad_fn(log_s)
    log_s = log_s - args.lr * g
    if step % 5 == 0 or step == args.steps - 1:
        print(
            f"step {step:3d}: post-closure ATE {float(loss):.5f} m, "
            f"scale {float(jnp.exp(log_s)):.4f} "
            f"(true {args.true_scale}), loop edges "
            f"{int((w > 0).sum())}"
        )

final = float(jnp.exp(log_s))
print(
    f"recovered range scale {final:.4f} (true {args.true_scale}); "
    f"rel err {abs(final - args.true_scale) / args.true_scale:.3%}"
)
