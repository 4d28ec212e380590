from .rgbdimages import (
    RGBDImages,
    compute_global_normal_map,
    compute_global_vertex_map,
    compute_normal_map,
    compute_vertex_map,
    valid_depth_mask,
)
from .pointclouds import Pointclouds
from .maparena import (
    MapState,
    append_to_map,
    compact_map,
    init_map,
    map_mask,
    map_to_pointclouds,
    voxel_compact_map,
)
from .structutils import list_to_padded, padded_to_list
from .utils import pointclouds_from_rgbdimages

__all__ = [
    "RGBDImages",
    "Pointclouds",
    "MapState",
    "init_map",
    "map_mask",
    "append_to_map",
    "compact_map",
    "voxel_compact_map",
    "map_to_pointclouds",
    "pointclouds_from_rgbdimages",
    "list_to_padded",
    "padded_to_list",
    "compute_vertex_map",
    "compute_global_vertex_map",
    "compute_normal_map",
    "compute_global_normal_map",
    "valid_depth_mask",
]
