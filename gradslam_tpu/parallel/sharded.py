"""Sharded SLAM execution: data-parallel batches, map-sharded arenas.

Net-new multi-device scope (the reference has no distributed machinery —
SURVEY.md §2.9). Strategy: express the whole SLAM program once, annotate
input shardings over a (data, map) mesh, and let XLA partition it —
gathers/segment-reductions over the sharded map lower to ICI collectives.

Also provides the differentiable training step used by the end-to-end
stretch goal (BASELINE configs[5]): optimize depth-correction parameters
by backprop through the full SLAM run, gradients psum'd across the mesh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..slam.icpslam import SLAMOptions, slam_sequence

__all__ = ["DepthCalibParams", "sharded_slam", "sharded_train_step", "slam_loss"]


class DepthCalibParams(NamedTuple):
    """Differentiable sensor-calibration parameters (the end-to-end
    'stretch' optimization target): depth = scale * depth + bias."""

    scale: jnp.ndarray  # ()
    bias: jnp.ndarray  # ()

    @classmethod
    def init(cls):
        return cls(scale=jnp.ones(()), bias=jnp.zeros(()))


def sharded_slam(
    mesh: Mesh,
    rgb_seq: jnp.ndarray,
    depth_seq: jnp.ndarray,
    intrinsics: jnp.ndarray,
    poses_seq: Optional[jnp.ndarray],
    opts: SLAMOptions,
    capacity: int,
):
    """Runs slam_sequence with batch sharded over the 'data' mesh axis and
    the map arena PARTITIONED over the 'map' axis.

    The arena sharding is pinned on the scan carry every frame
    (``slam_sequence(arena_sharding=...)``), so GSPMD keeps the (B, CAP,
    12) arena split across 'map' devices through association/fusion —
    the big state never replicates; frame images (small) do.

    Returns (map_state, poses): ``map_state.data`` sharded
    ``P('data', 'map')``, poses sharded ``P('data')``.
    """
    data_s = NamedSharding(mesh, P("data"))
    arena_s = NamedSharding(mesh, P("data", "map"))
    in_shardings = (data_s, data_s, data_s, None if poses_seq is None else data_s)

    fn = jax.jit(
        functools.partial(
            slam_sequence,
            opts=opts,
            capacity=capacity,
            arena_sharding=arena_s,
        ),
        in_shardings=in_shardings,
    )
    return fn(rgb_seq, depth_seq, intrinsics, poses_seq)


def slam_loss(
    params: DepthCalibParams,
    rgb_seq: jnp.ndarray,
    depth_seq: jnp.ndarray,
    intrinsics: jnp.ndarray,
    gt_poses: jnp.ndarray,
    opts: SLAMOptions,
    capacity: int,
):
    """Trajectory loss after applying depth calibration.

    Mean squared position error of the recovered trajectory vs ground
    truth — differentiable end-to-end through odometry and fusion.
    """
    depth = depth_seq * params.scale + params.bias * (depth_seq > 0)
    _, poses = slam_sequence(
        rgb_seq, depth, intrinsics, None, opts, capacity
    )
    return jnp.mean((poses[..., :3, 3] - gt_poses[..., :3, 3]) ** 2)


def sharded_train_step(
    mesh: Mesh,
    opts: SLAMOptions,
    capacity: int,
    lr: float = 1e-2,
):
    """Builds a jitted, mesh-sharded SGD step over DepthCalibParams.

    The batch shards over 'data'; parameters are replicated; XLA inserts
    the gradient psum across the mesh.
    """
    data_s = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def step(params, rgb, depth, K, gt_poses):
        loss, grads = jax.value_and_grad(slam_loss)(
            params, rgb, depth, K, gt_poses, opts, capacity
        )
        new_params = jax.tree_util.tree_map(
            lambda p, g: p - lr * g, params, grads
        )
        return new_params, loss

    params_s = DepthCalibParams(scale=rep, bias=rep)
    return jax.jit(
        step,
        in_shardings=(params_s, data_s, data_s, data_s, data_s),
        out_shardings=(params_s, rep),
    )
