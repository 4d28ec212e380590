from .icpslam import ICPSLAM, SLAMOptions, slam_sequence, slam_step
from .loopclosure import (
    LoopCandidates,
    close_loops,
    detect_loop_closures,
    verify_loop_closures,
)
from .pointfusion import PointFusion
from .fusionutils import (
    aggregate_map_dense,
    are_normals_similar,
    are_points_close,
    find_active_map_points,
    find_best_unique_correspondences,
    find_correspondences,
    find_correspondences_dense,
    find_similar_map_points,
    fuse_map_dense,
    fuse_with_map,
    get_alpha,
    update_map_aggregate,
    update_map_fusion,
)

__all__ = [
    "ICPSLAM",
    "PointFusion",
    "SLAMOptions",
    "slam_step",
    "slam_sequence",
    "get_alpha",
    "are_points_close",
    "are_normals_similar",
    "find_active_map_points",
    "find_similar_map_points",
    "find_best_unique_correspondences",
    "find_correspondences",
    "find_correspondences_dense",
    "fuse_map_dense",
    "aggregate_map_dense",
    "fuse_with_map",
    "update_map_fusion",
    "update_map_aggregate",
    "LoopCandidates",
    "detect_loop_closures",
    "verify_loop_closures",
    "close_loops",
]
