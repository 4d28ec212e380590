"""Pipeline parallelism: 2-stage pipelined SLAM over a device mesh.

SURVEY.md §2.9: the reference has no pipeline machinery; this is the
TPU-native PP deliverable — stage the per-frame work across devices:

  - stage 0 (ingest): the pose-INDEPENDENT frame maps of frame t+1
    (vertex map, normal map, valid mask — ``icpslam._frame_maps_local``),
  - stage 1 (solve): localization + fusion of frame t, consuming the
    ingested maps handed over by stage 0 at the previous step.

Expressed as a ``shard_map`` over a 2-device ``pipe`` mesh axis: the
stages diverge with ``lax.cond`` on ``axis_index`` (each device executes
only its branch at runtime) and the ingest handoff is one ``ppermute``
of ~H*W*7 floats per step. The per-step wall clock is
``max(ingest, solve) + transfer`` instead of their sum; the collective
is the only synchronization point.

The schedule is EXACT: the same math runs on the same inputs, one step
earlier on another device — results equal :func:`slam_sequence` (up to
XLA fusion rounding across program shapes). Frame-to-frame dependencies
(fusion t -> odometry t+1) stay on stage 1, which is why only the
pose-independent ingest pipelines; the classic 3-stage split
(ingest / odometry / fusion) is NOT exact for this algorithm — odometry
for t+1 needs the fused model of t.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..slam.icpslam import (
    SLAMOptions,
    _frame_maps_local,
    slam_init_state,
    slam_step_state,
)
from ..structures.maparena import MapState

__all__ = ["pipelined_slam_sequence", "pipeline_mesh"]

AXIS = "pipe"


def pipeline_mesh(devices=None) -> Mesh:
    """A 2-device mesh with the ``pipe`` axis (first two devices)."""
    devices = devices if devices is not None else jax.devices()[:2]
    if len(devices) < 2:
        raise ValueError("pipeline parallelism needs at least 2 devices")
    import numpy as np

    return Mesh(np.asarray(devices[:2]), (AXIS,))


def _zeros_like_tree(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


@functools.partial(
    jax.jit, static_argnames=("opts", "capacity", "mesh_holder")
)
def _pipelined_impl(rgb_seq, depth_seq, intrinsics, opts, capacity,
                    mesh_holder):
    mesh = mesh_holder.mesh
    B, L = rgb_seq.shape[:2]

    def run(rgb, dep, K):
        me = jax.lax.axis_index(AXIS)

        # frame 0 + frame 1's ingest run replicated (before the pipeline
        # has anything to overlap)
        state0 = slam_init_state(rgb[:, 0], dep[:, 0], K, opts, capacity)
        ingest1 = _frame_maps_local(dep[:, 1], K)

        # per-step inputs: frame s for the solve stage, frame s+1's depth
        # for the ingest stage (the last step ingests a dummy repeat)
        xs_solve = (rgb[:, 1:], dep[:, 1:])
        dep_next = jnp.concatenate([dep[:, 2:], dep[:, -1:]], axis=1)

        def step(carry, x):
            state, ingest = carry
            rgb_s, dep_s, dep_n = x

            # stage 1 (device 1): localize + fuse frame s with the maps
            # ingested at the previous step
            def _solve(operand):
                st, ing = operand
                return slam_step_state(
                    st, rgb_s, dep_s, K, opts, local_maps=ing
                )

            def _skip(operand):
                return operand[0]

            new_state = jax.lax.cond(me == 1, _solve, _skip, (state, ingest))

            # stage 0 (device 0): ingest frame s+1's pose-independent maps
            def _ingest(_):
                return _frame_maps_local(dep_n, K)

            def _dummy(_):
                return _zeros_like_tree(ingest)

            nxt = jax.lax.cond(me == 0, _ingest, _dummy, None)
            # handoff 0 -> 1 (device 0 receives zeros; its solve is a skip)
            nxt = jax.lax.ppermute(nxt, AXIS, [(0, 1)])
            return (new_state, nxt), new_state.pose

        (final_state, _), poses = jax.lax.scan(
            step,
            (state0, ingest1),
            jax.tree_util.tree_map(
                lambda a: jnp.moveaxis(a, 1, 0), (*xs_solve, dep_next)
            ),
        )

        # only device 1's results are meaningful; replicate them
        keep = (me == 1).astype(rgb.dtype)
        rep = lambda t: jax.tree_util.tree_map(
            lambda a: jax.lax.psum(a * keep.astype(a.dtype), AXIS), t
        )
        poses = jnp.moveaxis(poses, 0, 1)  # (B, L-1, 4, 4)
        poses = jnp.concatenate([state0.pose[:, None], poses], axis=1)
        num_points = jax.lax.psum(
            final_state.map_state.num_points * (me == 1), AXIS
        )
        data = rep(final_state.map_state.data)
        return MapState(data=data, num_points=num_points), rep(poses)

    return shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(MapState(data=P(), num_points=P()), P()),
        check_rep=False,
    )(rgb_seq, depth_seq, intrinsics)


class _MeshHolder:
    """Hashable wrapper so the mesh can be a static jit argument."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __hash__(self):
        return hash(
            (tuple(d.id for d in self.mesh.devices.flat), self.mesh.axis_names)
        )

    def __eq__(self, other):
        return (
            isinstance(other, _MeshHolder)
            and tuple(d.id for d in self.mesh.devices.flat)
            == tuple(d.id for d in other.mesh.devices.flat)
            and self.mesh.axis_names == other.mesh.axis_names
        )


def pipelined_slam_sequence(
    rgb_seq: jnp.ndarray,
    depth_seq: jnp.ndarray,
    intrinsics: jnp.ndarray,
    opts: SLAMOptions,
    capacity: int,
    mesh: Optional[Mesh] = None,
) -> Tuple[MapState, jnp.ndarray]:
    """Runs :func:`gradslam_tpu.slam.slam_sequence` with the frame-map
    ingest stage pipelined onto a second device.

    Args:
        rgb_seq / depth_seq: (B, L, H, W, 3/1) sequences (L >= 2).
        mesh: a 2-device mesh with a ``pipe`` axis (default: first two
            devices).

    Returns:
        (map_state, poses (B, L, 4, 4)) — equal to the single-device
        ``slam_sequence`` result.

    Requires non-gt odometry (gt poses need no pipeline) and L >= 2.
    """
    if opts.odom == "gt":
        raise ValueError("pipelining gt odometry is pointless — use "
                         "slam_sequence")
    if rgb_seq.shape[1] < 2:
        raise ValueError("need at least 2 frames to pipeline")
    mesh = mesh or pipeline_mesh()
    return _pipelined_impl(
        rgb_seq, depth_seq, intrinsics, opts, capacity, _MeshHolder(mesh)
    )
