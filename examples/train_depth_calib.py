"""End-to-end differentiable SLAM: optimize depth calibration parameters.

The BASELINE "stretch" config: backprop a trajectory loss through the
whole SLAM pipeline (gradICP odometry + PointFusion) to recover sensor
depth-calibration parameters (scale/bias). Demonstrates that gradients
flow from the recovered trajectory back to raw sensor inputs — the core
property of differentiable SLAM.

Runs out of the box on the golden clip:

    python examples/train_depth_calib.py --steps 30
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from gradslam_tpu.parallel import DepthCalibParams
from gradslam_tpu.parallel.sharded import slam_loss
from gradslam_tpu.slam.icpslam import SLAMOptions

DATA = pathlib.Path(__file__).parents[1] / "tests" / "data" / "msrd_b2s3"

parser = argparse.ArgumentParser()
parser.add_argument("--steps", type=int, default=30)
parser.add_argument("--lr", type=float, default=0.05)
parser.add_argument("--true_scale", type=float, default=1.1)
parser.add_argument("--init_scale", type=float, default=1.0)


def main():
    args = parser.parse_args()
    # half resolution keeps the reverse-mode program small for a demo
    colors = jnp.asarray(np.load(DATA / "colors.npy")[:1, :, ::2, ::2])
    depths_clean = jnp.asarray(np.load(DATA / "depths.npy")[:1, :, ::2, ::2])
    K = jnp.asarray(np.load(DATA / "intrinsics.npy")[:1]).at[:, :, :2].mul(0.5)
    B, L, H, W, _ = colors.shape

    # simulate a miscalibrated sensor: observed depth = true / true_scale
    depths_observed = depths_clean / args.true_scale

    opts = SLAMOptions(odom="gradicp", numiters=5, fusion=True)
    capacity = L * H * W

    # reference trajectory from the calibrated sensor: the optimization
    # target is exactly reproducible at the true scale (zero-noise optimum)
    from gradslam_tpu.slam.icpslam import slam_sequence

    _, gt_poses = slam_sequence(
        colors, depths_clean, K, None, opts, capacity
    )
    gt_poses = jax.lax.stop_gradient(gt_poses)

    @jax.jit
    def step(params, lr):
        loss, grads = jax.value_and_grad(slam_loss)(
            params, colors, depths_observed, K, gt_poses, opts, capacity
        )
        # normalized gradient step on the scale parameter (the raw
        # gradient magnitude depends on the tiny trajectory scale; the
        # sign/direction is what matters for this 1-D demo). Bias is kept
        # fixed: scale and bias are strongly coupled on a single clip.
        gnorm = jnp.abs(grads.scale) + 1e-20
        new = DepthCalibParams(
            scale=params.scale - lr * grads.scale / gnorm,
            bias=params.bias,
        )
        return new, loss

    params = DepthCalibParams(
        scale=jnp.asarray(args.init_scale), bias=jnp.zeros(())
    )
    for i in range(args.steps):
        lr = args.lr * (0.5 ** (i / max(args.steps / 3, 1)))
        params, loss = step(params, lr)
        if i % 5 == 0 or i == args.steps - 1:
            print(
                f"step {i:3d}: loss {float(loss):.3e} "
                f"scale {float(params.scale):.4f} "
                f"bias {float(params.bias):+.5f}"
            )
    print(
        f"\nrecovered scale {float(params.scale):.4f} "
        f"(true {args.true_scale}); residual "
        f"{abs(float(params.scale) - args.true_scale):.4f}"
    )


if __name__ == "__main__":
    main()
