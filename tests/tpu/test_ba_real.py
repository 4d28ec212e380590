"""Real-TPU bundle-adjustment solver equivalence.

The round-4 PCG preconditioner bug (block-Jacobi diagonal formed from
two separately-reduced near-cancelling sums) reproduced ONLY on the real
chip — CPU agreed exactly while TPU's guarded CG froze at an unconverged
point. The CPU-mesh suite can therefore never catch this class; this
test pins dense-vs-PCG agreement at a size large enough for reduction
noise to matter, on the hardware where it matters.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("GRADSLAM_TPU_TEST_REAL"),
    reason="needs real TPU (set GRADSLAM_TPU_TEST_REAL=1)",
)

L, M, OBS_PER_LM = 64, 20_000, 6


def _make_problem(seed=0):
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
    obs_pose = (
        (base[:, None] + np.arange(OBS_PER_LM)[None, :]) % L
    ).astype(np.int32).reshape(-1)
    Tinv = np.linalg.inv(poses.astype(np.float64))[obs_pose]
    pw = np.concatenate(
        [landmarks[obs_lm], np.ones((len(obs_lm), 1))], axis=1
    )
    pc = np.einsum("nij,nj->ni", Tinv, pw)[:, :3]
    pc += rng.normal(0, 0.002, pc.shape)
    init_lms = landmarks + rng.normal(0, 0.05, landmarks.shape).astype(
        np.float32
    )
    return poses, init_lms, obs_pose, obs_lm, pc.astype(np.float32)


def test_pcg_matches_dense_on_chip():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")
    from gradslam_tpu.parallel.pose_refine import ba_refine

    poses, lms, op, ol, pts = _make_problem()
    pj, lj, ptj = jnp.asarray(poses), jnp.asarray(lms), jnp.asarray(pts)
    out = {}
    for solver in ("dense", "pcg"):
        rp, rl = jax.jit(
            lambda p, l, pt, s=solver: ba_refine(
                p, l, op, ol, pt, num_iters=6,
                max_obs_per_landmark=OBS_PER_LM, solver=s, cg_iters=64,
            )
        )(pj, lj, ptj)
        out[solver] = (np.asarray(rp), np.asarray(rl))
    dp = np.abs(out["dense"][0] - out["pcg"][0]).max()
    dl = np.abs(out["dense"][1] - out["pcg"][1]).max()
    assert dp < 1e-3, f"pose disagreement dense vs pcg: {dp}"
    assert dl < 1e-2, f"landmark disagreement dense vs pcg: {dl}"
    # and the refinement actually pulled the noisy landmarks back
    rl = out["dense"][1]
    assert np.median(np.linalg.norm(rl - (lms), axis=1)) > 0.01
