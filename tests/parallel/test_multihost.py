"""Executes the multi-host bootstrap path for real: two local processes
rendezvous through ``jax.distributed.initialize`` (via the library's
``initialize_multihost``), build a global mesh spanning both processes,
and run a sharded pose-graph refinement whose edges are partitioned
across the processes (Gloo CPU collectives carry the psum).

This is the closest a single box gets to the SURVEY §2.9 multi-host
obligation: the rendezvous, process-spanning mesh and cross-process
collective all actually execute (no real DCN, but the same code path).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent
REPO = HERE.parents[1]
NPROC = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(mode: str, timeout: int = 240):
    port = _free_port()
    env = dict(os.environ)
    # two virtual CPU devices per process -> a 4-device global mesh
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    # python's sys.path[0] is the worker script's directory, not the cwd
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(HERE / "multihost_worker.py"),
                str(i),
                str(NPROC),
                str(port),
                mode,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=REPO,
            env=env,
        )
        for i in range(NPROC)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outputs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"process {i}/{NPROC}" in out, out
        # each process sees 2 local devices and the 4-device global view
        assert "2 local / 4 global" in out, out
    return outputs


def test_two_process_rendezvous_and_sharded_refine():
    outputs = _run_workers("refine")
    for i, out in enumerate(outputs):
        assert "MULTIHOST OK" in out, f"worker {i} output:\n{out}"


def test_two_process_sharded_train_step():
    """The FLAGSHIP sharded program (sharded_train_step: fwd+bwd through
    the fused SLAM scan, gradient psum over the mesh) across a real
    process boundary: batch partitioned over 2 processes x 2 devices,
    loss/updated params must match the single-process step."""
    outputs = _run_workers("train", timeout=480)
    for i, out in enumerate(outputs):
        assert "MULTIHOST TRAIN OK" in out, f"worker {i} output:\n{out}"
