"""Worker process for tests/parallel/test_multihost.py.

Each of the two processes runs this script: it bootstraps the JAX
distributed runtime through the LIBRARY's ``initialize_multihost`` (the
code under test — a real ``jax.distributed.initialize`` rendezvous over
localhost, Gloo CPU collectives) and builds a global mesh spanning both
processes with ``make_mesh``. Then, per the mode argument:

- ``refine``: runs ``pose_graph_refine_sharded`` with its edges
  partitioned across the processes. The refined trajectory is
  replicated, so each process independently checks it against the
  single-process dense ``pose_graph_refine`` on the same graph.
- ``train``: runs the FLAGSHIP sharded program — ``sharded_train_step``
  (forward + backward through the full fused SLAM scan, gradient psum
  across the mesh) — with the batch partitioned across the processes,
  for two SGD steps, and checks loss and updated parameters against the
  same step computed single-process on identical inputs.

Usage: python multihost_worker.py <process_id> <num_processes> <port> [mode]
"""

import pathlib
import sys

import jax

# The test environment force-registers a remote backend at interpreter
# start (sitecustomize); pin to CPU before any backend is touched.
jax.config.update("jax_platforms", "cpu")
# Share the suite's persistent compile cache (tests/conftest.py sets
# this up for in-process tests; this worker is a fresh subprocess and
# would otherwise recompile its sharded programs on every run — measured
# 88 s for the train mode, ~30 s warm with the cache).
jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).parents[2] / ".jax_compile_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402


def _train_mode(pid: int) -> None:
    """Cross-process sharded_train_step vs the single-process step."""
    import jax.numpy as jnp

    from gradslam_tpu.parallel import make_mesh
    from gradslam_tpu.parallel.sharded import (
        DepthCalibParams,
        sharded_train_step,
        slam_loss,
    )
    from gradslam_tpu.slam.icpslam import SLAMOptions

    mesh = make_mesh(data=jax.device_count())

    # tiny deterministic inputs, IDENTICAL on both processes: the golden
    # clip strided 4x, batch tiled 2 -> B=4 (one item per global device)
    import pathlib

    d = pathlib.Path(__file__).parents[1] / "data" / "msrd_b2s3"
    colors = np.load(d / "colors.npy")[:, :, ::4, ::4].astype(np.float32)
    depths = np.load(d / "depths.npy")[:, :, ::4, ::4].astype(np.float32)
    K = np.load(d / "intrinsics.npy").astype(np.float32).copy()
    K[:, :, :2] /= 4.0
    poses = np.load(d / "poses.npy").astype(np.float32)
    rgb = np.concatenate([colors, colors], axis=0)  # (4, 3, 30, 40, 3)
    dep = np.concatenate([depths, depths], axis=0)
    Kb = np.concatenate([K, K], axis=0)
    gt = np.concatenate([poses, poses], axis=0)
    B, L, H, W = rgb.shape[:4]

    opts = SLAMOptions(
        odom="gradicp", numiters=4, dsratio=2, fusion=True,
        assoc="projective", assoc_window=2 * H * W,
    )
    capacity = L * H * W
    # mis-calibrated start so the loss and gradients are non-trivial
    params0 = DepthCalibParams(
        scale=jnp.asarray(1.05), bias=jnp.asarray(0.01)
    )

    # global arrays: every process holds the same full value; each
    # device's shard is sliced out by index (the multi-controller input
    # path a real pod run uses)
    from jax.sharding import NamedSharding, PartitionSpec as P

    def global_batch(x):
        s = NamedSharding(mesh, P("data"))
        return jax.make_array_from_callback(x.shape, s, lambda i: x[i])

    def replicated(x):
        x = np.asarray(x)
        s = NamedSharding(mesh, P())
        return jax.make_array_from_callback(x.shape, s, lambda i: x[i])

    step = sharded_train_step(mesh, opts, capacity, lr=1e-3)
    params = jax.tree_util.tree_map(replicated, params0)
    args = tuple(global_batch(x) for x in (rgb, dep, Kb, gt))
    losses = []
    for _ in range(2):
        params, loss = step(params, *args)
        losses.append(float(loss))  # replicated scalar

    # single-process reference on the same inputs (local devices only)
    ref_params = params0
    ref_losses = []
    grad_fn = jax.jit(
        jax.value_and_grad(slam_loss), static_argnames=("opts", "capacity")
    )
    for _ in range(2):
        l0, g = grad_fn(
            ref_params, jnp.asarray(rgb), jnp.asarray(dep),
            jnp.asarray(Kb), jnp.asarray(gt), opts=opts, capacity=capacity,
        )
        ref_params = jax.tree_util.tree_map(
            lambda p, gg: p - 1e-3 * gg, ref_params, g
        )
        ref_losses.append(float(l0))

    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(jax.device_get(params.scale)), float(ref_params.scale),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(jax.device_get(params.bias)), float(ref_params.bias),
        rtol=1e-4, atol=1e-7,
    )
    # gradients actually flowed end-to-end through the sharded scan (the
    # loss at this miscalibration is ~5e-8 — far too flat for a descent
    # assertion at this scale, so assert the parameter moved instead)
    assert float(jax.device_get(params.scale)) != 1.05, "zero gradient"
    assert losses[0] > 0.0, losses
    print(
        f"[worker {pid}] MULTIHOST TRAIN OK loss {losses[0]:.6f}->"
        f"{losses[1]:.6f} scale {float(jax.device_get(params.scale)):.5f}",
        flush=True,
    )


def main() -> None:
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "refine"

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

    if mode == "train":
        _train_mode(pid)
        return

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
