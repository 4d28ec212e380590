"""Ground-truth odometry provider.

Reference parity: gradslam/odometry/groundtruth.py:15-75.
"""

from __future__ import annotations

from ..geometry import relative_transformation
from .base import OdometryProvider

__all__ = ["GroundTruthOdometryProvider"]


class GroundTruthOdometryProvider(OdometryProvider):
    """Returns the relative pose ``T1^-1 @ T2`` from stored frame poses."""

    def provide(self, rgbdimages1, rgbdimages2):
        """Relative transform between two seq-len-1 RGBDImages batches.

        Args:
            rgbdimages1: previous frames (B, 1) with poses.
            rgbdimages2: live frames (B, 1) with poses.

        Returns:
            (B, 1, 4, 4) transforms.
        """
        if rgbdimages1.shape[1] != 1 or rgbdimages2.shape[1] != 1:
            raise ValueError(
                "expected sequence length 1 for both frame batches, got "
                f"{rgbdimages1.shape[1]} and {rgbdimages2.shape[1]}"
            )
        if not (rgbdimages1.has_poses and rgbdimages2.has_poses):
            raise ValueError("both frame batches must have poses")
        t1 = rgbdimages1.poses[:, 0]
        t2 = rgbdimages2.poses[:, 0]
        return relative_transformation(t1, t2, orthogonal_rotations=False)[
            :, None
        ]
