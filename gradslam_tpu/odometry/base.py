"""Odometry provider interface.

Reference parity: gradslam/odometry/base.py:6-19.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

__all__ = ["OdometryProvider"]


class OdometryProvider(ABC):
    """Abstract base for odometry providers.

    A provider estimates the relative transform between two point sets /
    frames. Implementations must be pure (no hidden state mutation) so
    they compose with jit/scan.
    """

    @abstractmethod
    def provide(self, *args, **kwargs):
        """Returns (B, 1, 4, 4) relative transforms."""
        raise NotImplementedError
