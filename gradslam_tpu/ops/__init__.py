from .knn import KnnTargets, knn, knn_reference, prepare_targets
from .masking import compact_masked
from .voxel import voxel_merge, voxel_merge_rows

__all__ = [
    "knn",
    "knn_reference",
    "prepare_targets",
    "KnnTargets",
    "compact_masked",
    "voxel_merge",
    "voxel_merge_rows",
]
