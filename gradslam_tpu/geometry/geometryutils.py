"""General 3D geometry utilities (TPU-native, pure jnp).

Parity surface with the reference's geometryutils
(reference: gradslam/geometry/geometryutils.py) with batched, jit-safe
implementations. No kornia dependency: transform composition/inversion is
implemented directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .projutils import homogenize_points, unhomogenize_points

__all__ = [
    "create_meshgrid",
    "normalize_quaternion",
    "quaternion_to_axisangle",
    "quaternion_to_rotation_matrix",
    "inverse_transformation",
    "compose_transformations",
    "relative_transformation",
    "transform_pointcloud",
    "transform_normals",
    "cam2pixel",
    "pixel2cam",
]


@functools.lru_cache(maxsize=32)
def _meshgrid_np(height: int, width: int, normalized_coords: bool):
    import numpy as np

    if normalized_coords:
        xs = np.linspace(-1.0, 1.0, height, dtype=np.float32)
        ys = np.linspace(-1.0, 1.0, width, dtype=np.float32)
    else:
        xs = np.linspace(0.0, height - 1.0, height, dtype=np.float32)
        ys = np.linspace(0.0, width - 1.0, width, dtype=np.float32)
    grid = np.stack(np.meshgrid(xs, ys, indexing="ij"), axis=-1)  # (H, W, 2)
    return grid[None]  # (1, H, W, 2)


def create_meshgrid(
    height: int, width: int, normalized_coords: bool = True
) -> jnp.ndarray:
    """Generates a (1, H, W, 2) coordinate grid.

    Channel order matches the reference (gradslam/geometry/geometryutils.py:576):
    ``grid[..., 0]`` indexes rows (height), ``grid[..., 1]`` indexes columns
    (width). When ``normalized_coords`` both axes span [-1, 1].
    """
    return jnp.asarray(_meshgrid_np(int(height), int(width), bool(normalized_coords)))


def normalize_quaternion(quaternion: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalizes quaternions along the last dim.

    Reference parity: gradslam/geometry/geometryutils.py:127.
    """
    if quaternion.shape[-1] != 4:
        raise ValueError(f"quaternion must be (..., 4), got {quaternion.shape}")
    norm = jnp.linalg.norm(quaternion, axis=-1, keepdims=True)
    return quaternion / jnp.maximum(norm, eps)


def quaternion_to_axisangle(quaternion: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Converts (x, y, z, w) quaternions to axis-angle vectors.

    Reference parity: gradslam/geometry/geometryutils.py:79.
    """
    if quaternion.shape[-1] != 4:
        raise ValueError(f"quaternion must be (..., 4), got {quaternion.shape}")
    q1 = quaternion[..., 0]
    q2 = quaternion[..., 1]
    q3 = quaternion[..., 2]
    w = quaternion[..., 3]
    sin_sq_theta = q1 * q1 + q2 * q2 + q3 * q3
    sin_theta = jnp.sqrt(jnp.maximum(sin_sq_theta, 0.0))
    cos_theta = w

    # two_theta = 2 * atan2(sin, cos) choosing the short arc
    two_theta = 2.0 * jnp.where(
        cos_theta < 0.0,
        jnp.arctan2(-sin_theta, -cos_theta),
        jnp.arctan2(sin_theta, cos_theta),
    )
    k_pos = two_theta / jnp.maximum(sin_theta, eps)
    k_neg = jnp.full_like(sin_theta, 2.0)
    k = jnp.where(sin_sq_theta > 0.0, k_pos, k_neg)
    return jnp.stack([q1 * k, q2 * k, q3 * k], axis=-1)


def quaternion_to_rotation_matrix(quaternion: jnp.ndarray) -> jnp.ndarray:
    """Converts (x, y, z, w) quaternions to (..., 3, 3) rotation matrices.

    Reference parity: gradslam/geometry/geometryutils.py:148 (normalizes
    the quaternion first).
    """
    if quaternion.shape[-1] != 4:
        raise ValueError(f"quaternion must be (..., 4), got {quaternion.shape}")
    q = normalize_quaternion(quaternion)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    tx, ty, tz = 2.0 * x, 2.0 * y, 2.0 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz, tzz = ty * y, tz * y, tz * z
    one = jnp.ones_like(x)
    mat = jnp.stack(
        [
            one - (tyy + tzz), txy - twz, txz + twy,
            txy + twz, one - (txx + tzz), tyz - twx,
            txz - twy, tyz + twx, one - (txx + tyy),
        ],
        axis=-1,
    )
    return mat.reshape(q.shape[:-1] + (3, 3))


def inverse_transformation(trans: jnp.ndarray) -> jnp.ndarray:
    """Inverts rigid transforms: ``[R t; 0 1]^-1 = [R^T, -R^T t; 0 1]``.

    Reference parity: gradslam/geometry/geometryutils.py:205. Assumes the
    rotation block is orthogonal (true for SE(3) poses).

    Args:
        trans: (..., 4, 4) transforms.
    """
    if trans.shape[-2:] != (4, 4):
        raise ValueError(f"trans must be (..., 4, 4), got {trans.shape}")
    rmat = trans[..., :3, :3]
    tvec = trans[..., :3, 3]
    rmatT = jnp.swapaxes(rmat, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", rmatT, tvec)
    from .se3 import rt_matrix

    return rt_matrix(rmatT, t_inv)


def compose_transformations(trans_ab: jnp.ndarray, trans_bc: jnp.ndarray) -> jnp.ndarray:
    """Composes homogeneous transforms: returns ``trans_ab @ trans_bc``.

    Reference parity: gradslam/geometry/geometryutils.py:244 (kornia
    compose_transformations semantics).
    """
    return jnp.matmul(trans_ab, trans_bc)


def relative_transformation(
    trans_01: jnp.ndarray, trans_02: jnp.ndarray, orthogonal_rotations: bool = False
) -> jnp.ndarray:
    """Relative transform ``T_12 = T_01^-1 @ T_02``.

    Reference parity: gradslam/geometry/geometryutils.py:413. When
    ``orthogonal_rotations`` the inverse uses the analytic rigid-transform
    inverse; otherwise a general matrix inverse (matching the reference's
    use of ``torch.inverse`` for possibly non-orthogonal rotations).
    """
    if orthogonal_rotations:
        inv = inverse_transformation(trans_01)
    else:
        inv = jnp.linalg.inv(trans_01)
    return jnp.matmul(inv, trans_02)


def cam2pixel(
    cam_coords_src: jnp.ndarray,
    dst_proj_src: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Transforms camera-frame coordinates to pixel coordinates.

    Legacy helper (reference geometryutils.py:611): applies a (4, 4)
    projection to (..., H, W, 3) camera coordinates and perspective-divides.
    """
    if cam_coords_src.shape[-1] != 3:
        raise ValueError(
            f"cam_coords_src must be (..., 3), got {cam_coords_src.shape}"
        )
    pts = homogenize_points(cam_coords_src)
    projected = jnp.einsum("ij,...j->...i", dst_proj_src, pts)
    z = projected[..., 2:3]
    z_safe = jnp.where(jnp.abs(z) > eps, z, jnp.ones_like(z))
    return projected[..., :2] / z_safe


def pixel2cam(
    depth: jnp.ndarray,
    intrinsics_inv: jnp.ndarray,
    pixel_coords: jnp.ndarray,
) -> jnp.ndarray:
    """Transforms pixel coordinates + depth into camera-frame points.

    Legacy helper (reference geometryutils.py:671): ``depth * Kinv @ p``
    for homogeneous (..., H, W, 3) pixel coords.
    """
    kinv = jnp.asarray(intrinsics_inv)[..., :3, :3].reshape(3, 3)
    rays = jnp.einsum("ij,...j->...i", kinv, pixel_coords)
    depth = jnp.asarray(depth)
    if depth.ndim == rays.ndim - 1:
        depth = depth[..., None]
    return rays * depth


def transform_pointcloud(pointcloud: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Applies (..., 4, 4) rigid transforms to (..., N, 3) pointclouds.

    Reference parity: gradslam/geometry/geometryutils.py:737 (homogenize,
    matmul, unhomogenize).
    """
    if pointcloud.shape[-1] != 3:
        raise ValueError(f"pointcloud must be (..., N, 3), got {pointcloud.shape}")
    homo = homogenize_points(pointcloud)
    tformed = jnp.einsum(
        "...ij,...nj->...ni",
        transform,
        homo,
        precision=jax.lax.Precision.HIGHEST,
    )
    return unhomogenize_points(tformed)


def transform_normals(normals: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Rotates (..., N, 3) normals by the rotation block of (..., 4, 4) transforms.

    Reference parity: gradslam/geometry/geometryutils.py:797.
    """
    if normals.shape[-1] != 3:
        raise ValueError(f"normals must be (..., N, 3), got {normals.shape}")
    rmat = transform[..., :3, :3]
    return jnp.einsum(
        "...ij,...nj->...ni",
        rmat,
        normals,
        precision=jax.lax.Precision.HIGHEST,
    )
