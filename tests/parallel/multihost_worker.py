"""Worker process for tests/parallel/test_multihost.py.

Each of the two processes runs this script: it bootstraps the JAX
distributed runtime through the LIBRARY's ``initialize_multihost`` (the
code under test — a real ``jax.distributed.initialize`` rendezvous over
localhost, Gloo CPU collectives), builds a global mesh spanning both
processes with ``make_mesh``, and runs ``pose_graph_refine_sharded``
with its edges sharded across the processes. The refined trajectory is
replicated, so each process independently checks it against the
single-process dense ``pose_graph_refine`` on the same graph.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import sys

import jax

# The test environment force-registers a remote backend at interpreter
# start (sitecustomize); pin to CPU before any backend is touched.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from gradslam_tpu.parallel import multihost

    # NB: no JAX backend queries (is_multihost/process_count) before
    # initialize — they would initialise the XLA backend and make the
    # distributed rendezvous impossible.
    multihost.initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=n,
        process_id=pid,
    )
    assert multihost.is_multihost(), "distributed runtime not initialized"
    assert jax.process_count() == n
    assert jax.process_index() == pid
    print(f"[worker {pid}] {multihost.host_summary()}", flush=True)

    import jax.numpy as jnp

    from gradslam_tpu.geometry import se3_exp
    from gradslam_tpu.parallel import make_mesh
    from gradslam_tpu.parallel.pose_refine import (
        PoseGraph,
        pose_graph_refine,
        pose_graph_refine_sharded,
    )

    # global mesh over every device of every process (data axis)
    mesh = make_mesh(data=jax.device_count())
    assert mesh.devices.size == jax.device_count()

    # small synthetic pose graph: noisy odometry chain + one loop edge
    rng = np.random.default_rng(0)
    L = 8
    xi_true = jnp.asarray(
        rng.uniform(-0.2, 0.2, size=(L - 1, 6)), jnp.float32
    )
    poses_true = [jnp.eye(4, dtype=jnp.float32)]
    for i in range(L - 1):
        poses_true.append(poses_true[-1] @ se3_exp(xi_true[i]))
    poses_true = jnp.stack(poses_true)

    edges, meas, w = [], [], []
    for i in range(L - 1):
        edges.append((i, i + 1))
        noise = se3_exp(
            jnp.asarray(rng.normal(0, 0.01, size=(6,)), jnp.float32)
        )
        meas.append(
            jnp.linalg.solve(poses_true[i], poses_true[i + 1]) @ noise
        )
        w.append(1.0)
    edges.append((0, L - 1))  # loop edge, exact
    meas.append(jnp.linalg.solve(poses_true[0], poses_true[L - 1]))
    w.append(2.0)

    # perturb every pose EXCEPT the gauge anchor (pose 0 stays exact:
    # the refinement pins it, so perturbing it would leave an
    # unrecoverable rigid offset)
    perturb = jnp.asarray(rng.normal(0, 0.05, size=(L, 6)), jnp.float32)
    perturb = perturb.at[0].set(0.0)
    graph = PoseGraph(
        poses=poses_true @ jax.vmap(se3_exp)(perturb),
        edges=jnp.asarray(edges, jnp.int32),
        measurements=jnp.stack(meas),
        weights=jnp.asarray(w, jnp.float32),
    )

    refined_sharded = pose_graph_refine_sharded(
        graph, mesh, axis="data", num_iters=8
    )
    refined_dense = pose_graph_refine(graph, num_iters=8)

    np.testing.assert_allclose(
        np.asarray(refined_sharded), np.asarray(refined_dense),
        atol=1e-4, rtol=1e-4,
    )
    # the refinement must actually have moved toward the ground truth
    err0 = float(
        jnp.linalg.norm(graph.poses[..., :3, 3] - poses_true[..., :3, 3])
    )
    err1 = float(
        jnp.linalg.norm(
            refined_sharded[..., :3, 3] - poses_true[..., :3, 3]
        )
    )
    assert err1 < 0.5 * err0, (err0, err1)
    print(f"[worker {pid}] MULTIHOST OK err {err0:.4f}->{err1:.4f}", flush=True)


if __name__ == "__main__":
    main()
