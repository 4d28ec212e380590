from .mesh import make_mesh, shard_batch, shard_map_state
from .sharded import (
    DepthCalibParams,
    sharded_slam,
    sharded_train_step,
    slam_loss,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "shard_map_state",
    "DepthCalibParams",
    "sharded_slam",
    "sharded_train_step",
    "slam_loss",
]
