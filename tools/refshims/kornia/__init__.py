"""Minimal ``kornia`` shim: exactly the two functions the reference imports
(/root/reference/gradslam/geometry/geometryutils.py:8, slam/icpslam.py:6,
slam/fusionutils.py:5). Semantics match kornia.geometry.linalg 0.x."""
from . import geometry  # noqa: F401
