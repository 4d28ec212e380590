from .projutils import (
    project_points_to_pixels,
    homogenize_points,
    unhomogenize_points,
    project_points,
    unproject_points,
    inverse_intrinsics,
)
from .geometryutils import (
    create_meshgrid,
    normalize_quaternion,
    quaternion_to_axisangle,
    quaternion_to_rotation_matrix,
    inverse_transformation,
    compose_transformations,
    relative_transformation,
    transform_pointcloud,
    transform_normals,
)
from .se3 import so3_hat, se3_hat, so3_exp, se3_exp, se3_log

__all__ = [
    "project_points_to_pixels",
    "homogenize_points",
    "unhomogenize_points",
    "project_points",
    "unproject_points",
    "inverse_intrinsics",
    "create_meshgrid",
    "normalize_quaternion",
    "quaternion_to_axisangle",
    "quaternion_to_rotation_matrix",
    "inverse_transformation",
    "compose_transformations",
    "relative_transformation",
    "transform_pointcloud",
    "transform_normals",
    "so3_hat",
    "se3_hat",
    "so3_exp",
    "se3_exp",
    "se3_log",
]
