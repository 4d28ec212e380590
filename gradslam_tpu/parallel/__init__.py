from . import multihost
from .mesh import make_mesh, shard_batch, shard_map_state
from .pipeline import pipeline_mesh, pipelined_slam_sequence
from .pose_refine import (
    PoseGraph,
    ba_refine,
    ba_refine_sharded,
    partition_observations_by_landmark,
    pose_graph_refine,
    pose_graph_refine_sharded,
)
from .seqpar import merge_chunk_maps, sequence_parallel_slam
from .sharded import (
    DepthCalibParams,
    sharded_slam,
    sharded_train_step,
    slam_loss,
)

__all__ = [
    "multihost",
    "make_mesh",
    "pipeline_mesh",
    "pipelined_slam_sequence",
    "PoseGraph",
    "pose_graph_refine",
    "pose_graph_refine_sharded",
    "ba_refine",
    "ba_refine_sharded",
    "partition_observations_by_landmark",
    "sequence_parallel_slam",
    "merge_chunk_maps",
    "shard_batch",
    "shard_map_state",
    "DepthCalibParams",
    "sharded_slam",
    "sharded_train_step",
    "slam_loss",
]
