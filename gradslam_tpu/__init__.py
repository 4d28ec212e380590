"""gradslam_tpu: a TPU-native differentiable dense RGB-D SLAM framework.

Built on JAX / XLA / Pallas / pjit. Provides the full capability surface of
the reference differentiable-SLAM library (RGB-D structures, differentiable
projective data association, GradICP/Gauss-Newton odometry, PointFusion map
fusion, dataset loaders, trajectory metrics) re-designed TPU-first: static
shapes, scan/vmap instead of Python loops, Pallas kernels for the hot paths,
and jax.sharding for multi-chip scale-out.

Headline API (mirrors the reference's README):

    >>> from gradslam_tpu import RGBDImages, PointFusion
    >>> rgbdimages = RGBDImages(colors, depths, intrinsics)
    >>> slam = PointFusion()
    >>> pointclouds, recovered_poses = slam(rgbdimages)
    >>> pointclouds.plotly(0).show()
"""

from . import config, datasets, geometry, metrics, odometry, parallel, slam, structures
from .config import CfgNode
from .slam import ICPSLAM, PointFusion
from .structures import MapState, Pointclouds, RGBDImages, init_map

__version__ = "0.1.0"

__all__ = [
    "config",
    "datasets",
    "geometry",
    "metrics",
    "odometry",
    "parallel",
    "slam",
    "structures",
    "CfgNode",
    "ICPSLAM",
    "PointFusion",
    "Pointclouds",
    "RGBDImages",
    "MapState",
    "init_map",
    "__version__",
]
