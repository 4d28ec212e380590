"""Projective geometry utilities (TPU-native, pure jnp).

Functional parity surface with the reference library's projective ops
(reference: gradslam/geometry/projutils.py), re-designed for JAX: every
function is batched, jit-safe (static shapes, no data-dependent control
flow) and differentiable.

Conventions:
  - Pixel coordinates are (u, v) = (column, row).
  - Intrinsics are 4x4 (or 3x3) matrices with fx = K[0,0], fy = K[1,1],
    cx = K[0,2], cy = K[1,2].
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "homogenize_points",
    "unhomogenize_points",
    "project_points",
    "unproject_points",
    "inverse_intrinsics",
    "project_points_to_pixels",
]


def homogenize_points(pts: jnp.ndarray) -> jnp.ndarray:
    """Appends a homogeneous coordinate (1.0) to points.

    Args:
        pts: (..., K) points.

    Returns:
        (..., K+1) homogeneous points.

    Reference parity: gradslam/geometry/projutils.py:10.
    """
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def unhomogenize_points(pts: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Divides points by the homogeneous coordinate, guarding small w.

    w-division uses ``where(|w| > eps, 1/w, 1)`` — matching the reference's
    guard (gradslam/geometry/projutils.py:87) so that degenerate points pass
    through unscaled rather than producing inf/nan.

    Args:
        pts: (..., K+1) homogeneous points (K >= 1).

    Returns:
        (..., K) dehomogenized points.
    """
    if pts.shape[-1] < 2:
        raise ValueError(
            f"pts must have at least 2 coordinates in the last dim, got {pts.shape}"
        )
    w = pts[..., -1:]
    scale = jnp.where(jnp.abs(w) > eps, 1.0 / w, jnp.ones_like(w))
    return pts[..., :-1] * scale


def project_points(
    cam_coords: jnp.ndarray, proj_mat: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """Projects camera-frame 3D points to the image (pixel) plane.

    Accepts unhomogeneous (..., 3) or homogeneous (..., 4) points and a
    (..., 4, 4) projection (intrinsics) matrix which broadcasts against the
    point batch dims. The perspective division is guarded by
    ``where(z != 0, z, 1)`` as in the reference
    (gradslam/geometry/projutils.py:232-238).

    Returns:
        (..., 2) pixel coordinates (u, v).
    """
    if cam_coords.shape[-1] == 3:
        cam_coords = homogenize_points(cam_coords)
    elif cam_coords.shape[-1] != 4:
        raise ValueError(
            f"cam_coords last dim must be 3 or 4, got {cam_coords.shape}"
        )
    # (..., 4, 4) @ (..., 4) -> (..., 4); the projection matrix broadcasts
    # over batch dims, and (as in the reference) over the points dim when
    # given one matrix per batch element (e.g. points (B, N, 4) with
    # proj_mat (B, 4, 4)).
    try:
        jnp.broadcast_shapes(proj_mat.shape[:-2], cam_coords.shape[:-1])
    except ValueError:
        proj_mat = proj_mat[..., None, :, :]
    projected = jnp.einsum("...ij,...j->...i", proj_mat, cam_coords)
    z = projected[..., 2:3]
    z_safe = jnp.where(z != 0, z, jnp.ones_like(z))
    return projected[..., :2] / z_safe


def unproject_points(
    pixel_coords: jnp.ndarray, intrinsics_inv: jnp.ndarray, depths: jnp.ndarray
) -> jnp.ndarray:
    """Unprojects pixel coordinates plus depth into camera-frame 3D points.

    Args:
        pixel_coords: (..., 2) or homogeneous (..., 3) pixel coordinates.
        intrinsics_inv: (..., 3, 3) or (..., 4, 4) inverse intrinsics;
            broadcasts over point batch dims.
        depths: (...) per-point depth values.

    Returns:
        (..., 3) camera-frame points ``depth * Kinv @ [u, v, 1]``.

    Reference parity: gradslam/geometry/projutils.py:241.
    """
    if pixel_coords.shape[-1] == 2:
        pixel_coords = homogenize_points(pixel_coords)
    elif pixel_coords.shape[-1] != 3:
        raise ValueError(
            f"pixel_coords last dim must be 2 or 3, got {pixel_coords.shape}"
        )
    kinv = intrinsics_inv[..., :3, :3]
    rays = jnp.einsum("...ij,...j->...i", kinv, pixel_coords)
    return rays * depths[..., None]


def inverse_intrinsics(K: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Analytic inverse of a pinhole intrinsics matrix.

    Uses ``1 / (f + eps)`` terms exactly as the reference
    (gradslam/geometry/projutils.py:405-450) so derived vertex maps match
    bit-for-bit against golden data.

    Args:
        K: (..., 3, 3) or (..., 4, 4) intrinsics.

    Returns:
        Matrix of the same shape with the analytic inverse of the upper-left
        pinhole block (zeros elsewhere, 1 on the last diagonal entry).
    """
    if K.shape[-2:] not in ((3, 3), (4, 4)):
        raise ValueError(f"K must be (..., 3, 3) or (..., 4, 4), got {K.shape}")
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]

    Kinv = jnp.zeros_like(K)
    Kinv = Kinv.at[..., 0, 0].set(1.0 / (fx + eps))
    Kinv = Kinv.at[..., 1, 1].set(1.0 / (fy + eps))
    Kinv = Kinv.at[..., 0, 2].set(-cx / (fx + eps))
    Kinv = Kinv.at[..., 1, 2].set(-cy / (fy + eps))
    Kinv = Kinv.at[..., 2, 2].set(1.0)
    Kinv = Kinv.at[..., -1, -1].set(1.0)
    return Kinv


def project_points_to_pixels(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    H: int,
    W: int,
):
    """Projects world points into the camera at ``pose``: pixel rows/cols.

    The reference's ``find_active_map_points`` projection stage
    (reference: gradslam/slam/fusionutils.py:249-282): transform by
    ``pose^-1``, keep points with z > 0, pinhole-project, bounds-test with
    the reference's exact guards (``-1e-3 < u < W - 0.999``), then
    round-and-clamp to integer pixel indices. Shared by the fusion
    association pipeline and projective-association odometry.

    Args:
        points: (B, N, 3) world-frame points.
        valid: (B, N) bool (or float) point validity.
        pose: (B, 4, 4) camera-to-world pose.
        intrinsics: (B, 4, 4) or (B, 1, 4, 4).

    Returns:
        (h, w, active): (B, N) int32 pixel rows/cols (clamped into frame)
        and the (B, N) bool in-bounds mask.
    """
    from .geometryutils import inverse_transformation, transform_pointcloud

    tinv = inverse_transformation(pose)  # (B, 4, 4)
    pts_cam = transform_pointcloud(points, tinv)  # (B, N, 3)
    z = pts_cam[..., 2]
    K = intrinsics[:, 0] if intrinsics.ndim == 4 else intrinsics
    fx = K[..., 0, 0][:, None]
    fy = K[..., 1, 1][:, None]
    cx = K[..., 0, 2][:, None]
    cy = K[..., 1, 2][:, None]
    z_safe = jnp.where(z != 0, z, jnp.ones_like(z))
    u = (pts_cam[..., 0] * fx + z * cx) / z_safe
    v = (pts_cam[..., 1] * fy + z * cy) / z_safe
    active = (
        (u > -1e-3)
        & (u < W - 0.999)
        & (v > -1e-3)
        & (v < H - 0.999)
        & (z > 0)
        & valid
    )
    h = jnp.clip(jnp.round(v), 0, H - 1).astype(jnp.int32)
    w = jnp.clip(jnp.round(u), 0, W - 1).astype(jnp.int32)
    return h, w, active
