"""Smoke-run the example CLIs end to end (subprocess, real argv).

The reference ships runnable example scripts as part of its public
surface (examples/pointfusion.py etc.); nothing else in the suite
executes ours through their actual argparse entry points, so a broken
flag or import would be invisible. Each run uses a small rendered TUM
tree (datasets/synth) and tiny solver settings — the point is the
surface, not the accuracy (covered elsewhere)."""

import os
import subprocess
import sys
from pathlib import Path

import imageio.v2 as imageio
import numpy as np
import pytest

from gradslam_tpu.datasets.synth import render_loop_sequence

REPO = Path(__file__).parents[2]
H, W, N = 48, 64, 8


@pytest.fixture(scope="module")
def tum_tree(tmp_path_factory):
    colors, depths, _, poses = render_loop_sequence(
        n_frames=N, H=H, W=W, radius=0.12
    )
    root = tmp_path_factory.mktemp("tum_cli")
    seq = root / "rgbd_dataset_freiburg1_cli"
    (seq / "rgb").mkdir(parents=True)
    (seq / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(N):
        t = 10.0 + i * 0.033
        imageio.imwrite(
            str(seq / "rgb" / f"{t:.6f}.png"),
            colors[0, i].astype(np.uint8),
        )
        imageio.imwrite(
            str(seq / "depth" / f"{t:.6f}.png"),
            np.round(depths[0, i, ..., 0] * 5000.0).astype(np.uint16),
        )
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t:.6f} depth/{t:.6f}.png")
        tx, ty, tz = poses[0, i][:3, 3]
        gt_lines.append(f"{t:.6f} {tx:.6f} {ty:.6f} {tz:.6f} 0 0 0 1")
    (seq / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines))
    (seq / "depth.txt").write_text("# depth\n" + "\n".join(depth_lines))
    (seq / "groundtruth.txt").write_text("# gt\n" + "\n".join(gt_lines))
    return root


def _run(args, timeout=420):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # keep the CLI subprocesses OFF the attached TPU: the remote backend
    # is single-tenant (two xdist workers must not race it) and its
    # compile times would dominate. Dropping the axon pool var disables
    # the sitecustomize backend registration, so JAX_PLATFORMS=cpu works.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # share the suite's persistent compile cache with the subprocesses
    # (env vars work here because they're set before the interpreter
    # starts — in-process config is too late once sitecustomize imported
    # jax); without it every CLI run recompiles its SLAM program cold
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_compile_cache")
    )
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    out = subprocess.run(
        [sys.executable, *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=timeout,
    )
    assert out.returncode == 0, f"{args}:\n{out.stdout}\n{out.stderr}"
    return out.stdout


class TestExampleCLIs:
    def test_pointfusion(self, tum_tree):
        out = _run(
            [
                "examples/pointfusion.py", "--dataset", "tum",
                "--dataset_path", str(tum_tree), "--seqlen", "4",
                "--batch_size", "1", "--height", str(H),
                "--width", str(W), "--numiters", "4", "--odometry",
                "gradicp",
            ]
        )
        assert "poses" in out.lower() or out.strip()

    def test_icpslam(self, tum_tree):
        _run(
            [
                "examples/icpslam.py", "--dataset", "tum",
                "--dataset_path", str(tum_tree), "--seqlen", "4",
                "--batch_size", "1", "--height", str(H),
                "--width", str(W),
            ]
        )

    def test_evaluate_ate(self, tum_tree):
        out = _run(
            [
                "examples/evaluate_ate.py", "--dataset", "tum",
                "--dataset_path", str(tum_tree), "--seqlen", "4",
                "--height", str(H),
                "--width", str(W), "--numiters", "4",
            ]
        )
        assert "ate" in out.lower()
