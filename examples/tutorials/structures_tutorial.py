"""Tutorial: RGBDImages and Pointclouds structures.

Mirrors the reference's structures tutorial notebooks as a runnable
script.
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import pathlib

import jax.numpy as jnp
import numpy as np

from gradslam_tpu import Pointclouds, RGBDImages
from gradslam_tpu.geometry import se3_exp
from gradslam_tpu.structures import pointclouds_from_rgbdimages

DATA = pathlib.Path(__file__).parents[2] / "tests" / "data" / "msrd_b2s3"


def main():
    # --- RGBDImages ----------------------------------------------------
    colors = np.load(DATA / "colors.npy")
    depths = np.load(DATA / "depths.npy")
    intrinsics = np.load(DATA / "intrinsics.npy")
    poses = np.load(DATA / "poses.npy")
    rgbd = RGBDImages(colors, depths, intrinsics, poses)
    print("shape (B, L, H, W):", rgbd.shape)

    # lazy derived maps
    print("valid pixels:", int(np.asarray(rgbd.valid_depth_mask).sum()))
    print("vertex map:", rgbd.vertex_map.shape)
    print("global normal map:", rgbd.global_normal_map.shape)

    # (batch, time) indexing keeps dims
    frame = rgbd[0, 1]
    print("one frame:", frame.shape)

    # channels-first view for torch-style consumers
    print("channels-first rgb:", rgbd.to_channels_first().rgb_image.shape)

    # --- Pointclouds ---------------------------------------------------
    # from ragged per-cloud arrays
    rng = np.random.RandomState(0)
    pc = Pointclouds(
        points=[rng.randn(100, 3).astype(np.float32),
                rng.randn(60, 3).astype(np.float32)],
        colors=[rng.rand(100, 3).astype(np.float32),
                rng.rand(60, 3).astype(np.float32)],
    )
    print("pointclouds:", pc)

    # arithmetic and rigid-transform ops (functional: return new objects)
    moved = (pc + jnp.asarray([1.0, 0, 0])) * 2.0
    T = se3_exp(jnp.asarray([0.1, 0, 0, 0, 0, 0.3]))
    transformed = pc.transform(T)
    print("transformed first point:", np.asarray(transformed.points_padded[0, 0]))

    # from an RGB-D frame (world-frame cloud, invalid depths filtered)
    frame_pc = pointclouds_from_rgbdimages(rgbd[:, 0])
    print(
        "frame cloud sizes:",
        np.asarray(frame_pc.num_points_per_pointcloud),
    )


if __name__ == "__main__":
    main()
