from .knn import knn, knn_reference
from .masking import compact_masked
from .voxel import voxel_merge, voxel_merge_rows

__all__ = [
    "knn",
    "knn_reference",
    "compact_masked",
    "voxel_merge",
    "voxel_merge_rows",
]
