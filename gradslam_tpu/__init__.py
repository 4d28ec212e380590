"""gradslam_tpu: a TPU-native differentiable dense RGB-D SLAM framework.

Built on JAX / XLA / Pallas / pjit. Provides the full capability surface of
the reference differentiable-SLAM library (RGB-D structures, differentiable
projective data association, GradICP/Gauss-Newton odometry, PointFusion map
fusion, dataset loaders, trajectory metrics) re-designed TPU-first: static
shapes, scan/vmap instead of Python loops, Pallas kernels for the hot paths,
and jax.sharding for multi-chip scale-out.
"""

from . import geometry

__version__ = "0.1.0"

__all__ = ["geometry", "__version__"]
