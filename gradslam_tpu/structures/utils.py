"""Structure conversion helpers.

Reference parity: gradslam/structures/utils.py:7-57
(``pointclouds_from_rgbdimages``).
"""

from __future__ import annotations

import jax.numpy as jnp

from .pointclouds import Pointclouds
from .rgbdimages import RGBDImages

__all__ = ["pointclouds_from_rgbdimages"]


def pointclouds_from_rgbdimages(
    rgbdimages: RGBDImages,
    *,
    global_coordinates: bool = True,
    filter_missing_depths: bool = True,
) -> Pointclouds:
    """Converts a sequence-length-1 RGBDImages batch into Pointclouds.

    Uses global (or camera-frame) vertex/normal maps and RGB colors. With
    ``filter_missing_depths`` the invalid-depth pixels are excluded from
    the per-cloud counts; on device this is a padded representation (the
    valid points are compacted to the front of each cloud), matching the
    reference's ragged output at the host boundary.
    """
    if not isinstance(rgbdimages, RGBDImages):
        raise TypeError(
            f"expected RGBDImages, got {type(rgbdimages).__name__}"
        )
    if rgbdimages.shape[1] != 1:
        raise ValueError(
            f"expected sequence length 1, got {rgbdimages.shape[1]}"
        )
    rgbd = rgbdimages.to_channels_last()
    B, _, H, W = rgbd.shape
    if global_coordinates:
        vmap = rgbd.global_vertex_map
        nmap = rgbd.global_normal_map
    else:
        vmap = rgbd.vertex_map
        nmap = rgbd.normal_map
    colors = rgbd.rgb_image

    pts = vmap.reshape(B, H * W, 3)
    nrm = nmap.reshape(B, H * W, 3)
    col = colors.reshape(B, H * W, 3)

    if not filter_missing_depths:
        return Pointclouds(points=pts, normals=nrm, colors=col)

    valid = rgbd.valid_depth_mask.reshape(B, H * W)
    # Compact valid points to the front of each cloud (stable order), so the
    # padded+count representation matches the reference's ragged filtering.
    order = jnp.argsort(~valid, axis=1, stable=True)
    take = lambda x: jnp.take_along_axis(x, order[..., None], axis=1)
    counts = jnp.sum(valid, axis=1).astype(jnp.int32)
    mask = (
        jnp.arange(H * W, dtype=jnp.int32)[None, :] < counts[:, None]
    )[..., None]
    z = mask.astype(pts.dtype)
    return Pointclouds(
        points=take(pts) * z,
        normals=take(nrm) * z,
        colors=take(col) * z,
        num_points=counts,
    )
