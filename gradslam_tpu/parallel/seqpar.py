"""Sequence-parallel SLAM: keyframe-chunk partitioning across devices.

Net-new scope (SURVEY.md §2.9): the sequence/context-parallel analogue for
SLAM. The reference processes the L-frame trajectory strictly serially
(gradslam/slam/icpslam.py:125); here the sequence is partitioned into
overlapping chunks, each chunk runs local SLAM **in parallel** (the chunk
dimension folds into the batch dimension, sharded over the mesh 'data'
axis), and chunk-local trajectories are stitched exactly at the shared
boundary frames. An optional pose-graph refinement pass (psum-distributed
Gauss-Newton, parallel/pose_refine.py) polishes the stitched trajectory
with odometry and loop-closure constraints.

Partitioning scheme (overlap = 1 frame):

    chunk 0: frames [0 .. Lc-1]
    chunk 1: frames [Lc-1 .. 2Lc-2]      <- first frame = chunk 0's last
    ...

Each chunk starts at local identity; since chunk c+1's first frame IS
chunk c's last frame, the global origin of chunk c+1 is
``origin_c @ local_poses_c[-1]`` — stitching is exact composition, no
extra alignment solve. Wall-clock becomes O(L / n_chunks) per device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..slam.icpslam import SLAMOptions, slam_sequence
from .pose_refine import PoseGraph, pose_graph_refine

__all__ = ["SeqParResult", "chunk_sequence", "sequence_parallel_slam"]


class SeqParResult(NamedTuple):
    """Result of a sequence-parallel run.

    Attributes:
        poses: (B, L, 4, 4) stitched global trajectory.
        chunk_maps: MapState with leading dim B*n_chunks (chunk-local
            frames) — pass through :func:`merge_chunk_maps` for a global
            Pointclouds.
        chunk_origins: (B, n_chunks, 4, 4) global chunk origin poses.
        n_chunks: static chunk count.
        chunk_len: frames per chunk (with 1-frame overlap).
    """

    poses: jnp.ndarray
    chunk_maps: object
    chunk_origins: jnp.ndarray
    n_chunks: int
    chunk_len: int


def chunk_sequence(x: jnp.ndarray, n_chunks: int, chunk_len: int) -> jnp.ndarray:
    """Splits (B, L, ...) into (B*n_chunks, chunk_len, ...) overlapping
    chunks (stride chunk_len-1); the tail chunk is padded by repeating the
    last frame."""
    B, L = x.shape[:2]
    stride = chunk_len - 1
    need = stride * (n_chunks - 1) + chunk_len
    if need > L:
        pad = need - L
        x = jnp.concatenate(
            [x] + [x[:, -1:]] * pad, axis=1
        )
    starts = [c * stride for c in range(n_chunks)]
    chunks = jnp.stack(
        [x[:, s : s + chunk_len] for s in starts], axis=1
    )  # (B, n, Lc, ...)
    return chunks.reshape((B * n_chunks, chunk_len) + x.shape[2:])


def _unchunk_poses(local_poses, B, n_chunks, chunk_len, L):
    """Stitches (B*n, Lc, 4, 4) local poses into (B, L, 4, 4) global ones."""
    lp = local_poses.reshape(B, n_chunks, chunk_len, 4, 4)

    # chunk origins: origin_0 = I; origin_{c+1} = origin_c @ lp[c, -1]
    def scan_fn(origin, last_pose):
        new_origin = jnp.matmul(origin, last_pose)
        return new_origin, origin

    def per_batch(lp_b):
        eye = jnp.eye(4, dtype=lp_b.dtype)
        _, origins = jax.lax.scan(scan_fn, eye, lp_b[:, -1])
        return origins  # (n, 4, 4): origin of each chunk

    origins = jax.vmap(per_batch)(lp)  # (B, n, 4, 4)
    global_poses = jnp.einsum("bnij,bnljk->bnlik", origins, lp)

    # drop the overlapping first frame of chunks 1.. and flatten
    stride = chunk_len - 1
    first = global_poses[:, 0]  # (B, Lc, 4, 4)
    rest = global_poses[:, 1:, 1:]  # (B, n-1, Lc-1, 4, 4)
    flat = jnp.concatenate(
        [first, rest.reshape(first.shape[0], -1, 4, 4)], axis=1
    )
    return flat[:, :L], origins


def sequence_parallel_slam(
    rgb_seq: jnp.ndarray,
    depth_seq: jnp.ndarray,
    intrinsics: jnp.ndarray,
    opts: SLAMOptions,
    n_chunks: int,
    chunk_capacity: Optional[int] = None,
    mesh=None,
    refine: bool = False,
    refine_iters: int = 5,
) -> SeqParResult:
    """Runs SLAM with the sequence partitioned into parallel chunks.

    Args:
        rgb_seq / depth_seq: (B, L, H, W, 3/1).
        intrinsics: (B, 1, 4, 4).
        opts: SLAM options (odometry must be 'icp'/'gradicp' — chunk-local
            runs have no ground truth).
        n_chunks: number of parallel chunks; the chunk dim folds into the
            batch dim, so B*n_chunks should be a multiple of the mesh
            'data' axis when ``mesh`` is given.
        chunk_capacity: per-chunk arena capacity (default chunk_len*H*W).
        mesh: optional jax Mesh; shards the chunked batch over 'data'.
        refine: run pose-graph Gauss-Newton over the stitched trajectory
            using consecutive-frame odometry edges.

    Returns:
        SeqParResult.
    """
    if opts.odom == "gt":
        raise ValueError("sequence-parallel SLAM requires ICP odometry")
    B, L, H, W, _ = rgb_seq.shape
    stride_chunks = max(1, n_chunks)
    chunk_len = -(-((L - 1)) // stride_chunks) + 1  # ceil((L-1)/n) + 1
    capacity = chunk_capacity or chunk_len * H * W

    rgb_c = chunk_sequence(rgb_seq, n_chunks, chunk_len)
    dep_c = chunk_sequence(depth_seq, n_chunks, chunk_len)
    K_c = jnp.repeat(intrinsics, n_chunks, axis=0)

    run = functools.partial(slam_sequence, opts=opts, capacity=capacity)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_s = NamedSharding(mesh, P("data"))
        rgb_c = jax.device_put(rgb_c, data_s)
        dep_c = jax.device_put(dep_c, data_s)
        K_c = jax.device_put(K_c, data_s)
    chunk_maps, local_poses = run(rgb_c, dep_c, K_c, None)

    poses, origins = _unchunk_poses(local_poses, B, n_chunks, chunk_len, L)

    if refine:
        poses = _refine_trajectory(poses, refine_iters)

    return SeqParResult(
        poses=poses,
        chunk_maps=chunk_maps,
        chunk_origins=origins,
        n_chunks=n_chunks,
        chunk_len=chunk_len,
    )


def _refine_trajectory(poses: jnp.ndarray, num_iters: int) -> jnp.ndarray:
    """Pose-graph polish with consecutive-frame odometry edges."""
    from ..geometry import relative_transformation

    B, L = poses.shape[:2]
    edges = jnp.stack(
        [jnp.arange(L - 1), jnp.arange(1, L)], axis=-1
    ).astype(jnp.int32)

    def per_batch(p):
        Z = relative_transformation(
            p[:-1], p[1:], orthogonal_rotations=True
        )
        graph = PoseGraph(
            poses=p,
            edges=edges,
            measurements=Z,
            weights=jnp.ones((L - 1,), p.dtype),
        )
        return pose_graph_refine(graph, num_iters=num_iters)

    return jax.vmap(per_batch)(poses)


def merge_chunk_maps(
    result: SeqParResult,
    batch_size: int,
    dedup_voxel: Optional[float] = None,
):
    """Merges chunk-local maps into per-batch global Pointclouds.

    Transforms each chunk's arena by its global origin and concatenates
    live points (host boundary). Overlap frames contribute duplicate
    points at chunk seams; pass ``dedup_voxel`` (a cell size in map units,
    e.g. the fusion ``dist_th``) to run a cross-chunk voxel fusion pass
    (ops/voxel.py) that collapses seam duplicates into single
    confidence-weighted points — the voxel analogue of PointFusion's
    projective association, applicable where no single camera sees the
    seam.
    """
    from ..structures import Pointclouds

    maps = result.chunk_maps
    n = result.n_chunks
    origins = np.asarray(result.chunk_origins)  # (B, n, 4, 4)
    data = np.asarray(maps.data)  # (B*n, CAP, 12)
    counts = np.asarray(maps.num_points)  # (B*n,)

    pts_l, nrm_l, col_l, feat_l = [], [], [], []
    for b in range(batch_size):
        pts, nrms, cols, feats = [], [], [], []
        for c in range(n):
            i = b * n + c
            k = counts[i]
            if k == 0:
                continue
            rows = data[i, :k]
            T = origins[b, c]
            p = rows[:, 0:3] @ T[:3, :3].T + T[:3, 3]
            nr = rows[:, 3:6] @ T[:3, :3].T
            pts.append(p)
            nrms.append(nr)
            cols.append(rows[:, 6:9])
            feats.append(rows[:, 9:10])
        pts_l.append(np.concatenate(pts) if pts else np.zeros((0, 3), np.float32))
        nrm_l.append(np.concatenate(nrms) if nrms else np.zeros((0, 3), np.float32))
        col_l.append(np.concatenate(cols) if cols else np.zeros((0, 3), np.float32))
        feat_l.append(np.concatenate(feats) if feats else np.zeros((0, 1), np.float32))

    if dedup_voxel is not None:
        from ..ops.voxel import voxel_merge

        for b in range(batch_size):
            n = len(pts_l[b])
            if n == 0:
                continue
            mp, mn, mc, mcc, mlive = voxel_merge(
                jnp.asarray(pts_l[b])[None],
                jnp.asarray(nrm_l[b])[None],
                jnp.asarray(col_l[b])[None],
                jnp.asarray(feat_l[b])[None],
                jnp.ones((1, n), bool),
                dedup_voxel,
            )
            k = int(np.asarray(mlive[0]).sum())
            pts_l[b] = np.asarray(mp[0][:k])
            nrm_l[b] = np.asarray(mn[0][:k])
            col_l[b] = np.asarray(mc[0][:k])
            feat_l[b] = np.asarray(mcc[0][:k])

    return Pointclouds(
        points=pts_l, normals=nrm_l, colors=col_l, features=feat_l
    )
