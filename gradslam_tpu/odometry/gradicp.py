"""GradICP odometry provider (smooth, fully differentiable LM).

Reference parity: gradslam/odometry/gradicp.py:12-122, minus the
per-batch Python loop (the solver is natively batched).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .base import OdometryProvider
from .icputils import point_to_plane_gradICP

__all__ = ["GradICPOdometryProvider"]


class GradICPOdometryProvider(OdometryProvider):
    """GradICP odometry using the gradLM soft trust region.

    Args:
        numiters: solver iterations. Default 20.
        damp: initial damping. Default 1e-8.
        dist_thresh: optional squared-distance association gate.
        lambda_max: max damping gain (lambda_min = 1/lambda_max). Default 2.
        B: gradLM damping-gate falloff. Default 1.
        B2: gradLM step-gate falloff. Default 1.
        nu: gradLM step-gate exponent. Default 200.
    """

    def __init__(
        self,
        numiters: int = 20,
        damp: float = 1e-8,
        dist_thresh: Optional[float] = None,
        lambda_max: float = 2.0,
        B: float = 1.0,
        B2: float = 1.0,
        nu: float = 200.0,
    ):
        self.numiters = numiters
        self.damp = damp
        self.dist_thresh = dist_thresh
        self.lambda_max = lambda_max
        self.B = B
        self.B2 = B2
        self.nu = nu

    def provide(self, maps_pointclouds, frames_pointclouds):
        """Relative transforms warping frame clouds onto map clouds.

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
        transform = point_to_plane_gradICP(
            frames_pointclouds.points_padded,
            maps_pointclouds.points_padded,
            maps_pointclouds.normals_padded,
            None,
            numiters=self.numiters,
            damp=self.damp,
            dist_thresh=self.dist_thresh,
            lambda_max=self.lambda_max,
            B=self.B,
            B2=self.B2,
            nu=self.nu,
            src_valid=frames_pointclouds.nonpad_mask.astype(jnp.float32),
            tgt_valid=maps_pointclouds.nonpad_mask,
        )
        return transform[:, None]
