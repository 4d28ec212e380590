"""Real-chip benchmark: Schur-complement bundle adjustment (dense vs PCG).

Measures `ba_refine` on the attached TPU at L in {64, 256} poses and
M in {1e4, 1e5} landmarks (~6 observations per landmark), reporting
micro-seconds per Gauss-Newton iteration for both reduced-camera-system
solvers. Answers the dense-vs-matrix-free crossover question with
hardware numbers instead of virtual-mesh ones (the pose_refine tests run
on the CPU mesh, which says nothing about TPU scatter/linalg costs).

Usage: python tools/bench_ba.py [--iters 8] [--reps 3]
Prints one JSON line per configuration.
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

OBS_PER_LM = 6


def make_problem(L, M, seed=0):
    """Synthetic BA: a pose chain observing M landmarks, 6 obs each."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, L)
    poses = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
    poses[:, 0, 3] = t * 2.0
    poses[:, 1, 3] = 0.1 * np.sin(6 * t)
    landmarks = rng.uniform(
        [-1, -1, 2.0], [3, 1, 4.0], size=(M, 3)
    ).astype(np.float32)
    obs_lm = np.repeat(np.arange(M, dtype=np.int32), OBS_PER_LM)
    base = rng.integers(0, L, size=M)
    offs = np.arange(OBS_PER_LM)
    obs_pose = ((base[:, None] + offs[None, :]) % L).astype(np.int32)
    obs_pose = obs_pose.reshape(-1)
    # camera-frame observation points (with a little noise)
    Tinv = np.linalg.inv(poses.astype(np.float64))[obs_pose]
    pw = np.concatenate(
        [landmarks[obs_lm], np.ones((len(obs_lm), 1))], axis=1
    )
    pc = np.einsum("nij,nj->ni", Tinv, pw)[:, :3]
    pc += rng.normal(0, 0.002, pc.shape)
    return (
        poses,
        landmarks + rng.normal(0, 0.05, landmarks.shape).astype(np.float32),
        obs_pose,
        obs_lm,
        pc.astype(np.float32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cg-iters", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gradslam_tpu.parallel.pose_refine import ba_refine

    for L in (64, 256):
        for M in (10_000, 100_000):
            poses, lms, op, ol, pts = make_problem(L, M)
            for solver in ("dense", "pcg"):
                fn = jax.jit(
                    lambda p, l, pt, s=solver: ba_refine(
                        p, l, op, ol, pt,
                        num_iters=args.iters,
                        max_obs_per_landmark=OBS_PER_LM,
                        solver=s, cg_iters=args.cg_iters,
                    )
                )
                pj, lj, ptj = (
                    jnp.asarray(poses), jnp.asarray(lms), jnp.asarray(pts)
                )
                rp, rl = fn(pj, lj, ptj)  # compile + remote warm
                float(rp.sum())
                rp, rl = fn(pj, lj, ptj)
                float(rp.sum())
                times = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    rp, rl = fn(pj, lj, ptj)
                    float(rp.sum() + rl.sum())
                    times.append(time.perf_counter() - t0)
                dt = min(times)
                # sanity: the refinement must actually improve landmarks
                err = float(
                    jnp.linalg.norm(rp[..., :3, 3] - poses[..., :3, 3])
                )
                print(
                    json.dumps(
                        dict(
                            L=L, M=M, N=M * OBS_PER_LM, solver=solver,
                            us_per_gn_iter=round(dt / args.iters * 1e6, 1),
                            total_ms=round(dt * 1e3, 2),
                            pose_shift=round(err, 5),
                        )
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
