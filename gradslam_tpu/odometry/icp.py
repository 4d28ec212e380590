"""Classic point-to-plane ICP odometry provider.

Reference parity: gradslam/odometry/icp.py:12-97, minus the per-batch
Python loop (the solver is natively batched).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .base import OdometryProvider
from .icputils import point_to_plane_ICP

__all__ = ["ICPOdometryProvider"]


class ICPOdometryProvider(OdometryProvider):
    """ICP odometry with the classic LM accept/reject trust region.

    Args:
        numiters: solver iterations. Default 20.
        damp: initial LM damping. Default 1e-8.
        dist_thresh: optional squared-distance association gate.
    """

    def __init__(
        self,
        numiters: int = 20,
        damp: float = 1e-8,
        dist_thresh: Optional[float] = None,
    ):
        self.numiters = numiters
        self.damp = damp
        self.dist_thresh = dist_thresh

    def provide(self, maps_pointclouds, frames_pointclouds):
        """Relative transforms warping frame clouds onto map clouds.

        Args:
            maps_pointclouds: target Pointclouds (with normals).
            frames_pointclouds: source Pointclouds.

        Returns:
            (B, 1, 4, 4) transforms.
        """
        if maps_pointclouds.normals_padded is None:
            raise ValueError("maps_pointclouds must have normals")
        if len(maps_pointclouds) != len(frames_pointclouds):
            raise ValueError(
                "batch size mismatch: "
                f"{len(maps_pointclouds)} vs {len(frames_pointclouds)}"
            )
        transform = point_to_plane_ICP(
            frames_pointclouds.points_padded,
            maps_pointclouds.points_padded,
            maps_pointclouds.normals_padded,
            None,
            numiters=self.numiters,
            damp=self.damp,
            dist_thresh=self.dist_thresh,
            src_valid=frames_pointclouds.nonpad_mask.astype(jnp.float32),
            tgt_valid=maps_pointclouds.nonpad_mask,
        )
        return transform[:, None]
