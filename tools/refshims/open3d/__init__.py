"""Minimal import-shim for ``open3d``.

The reference imports open3d at package import time
(/root/reference/gradslam/__init__.py:1-2 — an import-order hack) and only
*calls* it from the viz exports (``Pointclouds.open3d``,
``o3d.visualization.draw_geometries``), which tools/run_reference.py never
exercises. This shim satisfies the import so the reference's SLAM math can
run on this box (no open3d wheel available, zero egress).
"""


class _Vector3dVector:
    def __init__(self, data=None):
        self.data = data


class _PointCloud:
    def __init__(self):
        self.points = None
        self.colors = None
        self.normals = None


class geometry:  # noqa: N801 - mirror open3d module layout
    PointCloud = _PointCloud


class utility:  # noqa: N801
    Vector3dVector = _Vector3dVector


class visualization:  # noqa: N801
    @staticmethod
    def draw_geometries(*args, **kwargs):
        raise RuntimeError("open3d shim: visualization is not available")


__version__ = "0.0.0-shim"
