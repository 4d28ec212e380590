"""Tutorial: PointFusion SLAM end to end.

Mirrors the reference's pointfusion tutorial notebook as a runnable
script, using the golden RGB-D clip shipped with the tests (no dataset
download needed).
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import pathlib

import numpy as np

from gradslam_tpu import PointFusion, RGBDImages
from gradslam_tpu.metrics import ate_rmse

DATA = pathlib.Path(__file__).parents[2] / "tests" / "data" / "msrd_b2s3"


def main():
    # 1. Load a batch of RGB-D sequences: colors (B, L, H, W, 3),
    #    depths (B, L, H, W, 1), intrinsics (B, 1, 4, 4), poses (B, L, 4, 4)
    colors = np.load(DATA / "colors.npy")
    depths = np.load(DATA / "depths.npy")
    intrinsics = np.load(DATA / "intrinsics.npy")
    poses = np.load(DATA / "poses.npy")

    # 2. Wrap them as RGBDImages — derived maps (vertex/normal, local and
    #    global) are computed lazily and cached.
    rgbdimages = RGBDImages(colors, depths, intrinsics, poses)
    print("vertex map:", rgbdimages.vertex_map.shape)
    print("normal map:", rgbdimages.normal_map.shape)

    # 3. Run PointFusion with gradICP odometry. The whole sequence runs as
    #    one compiled XLA program (lax.scan over frames).
    slam = PointFusion(odom="gradicp", numiters=10)
    pointclouds, recovered_poses = slam(rgbdimages)

    print("map points per batch:", np.asarray(pointclouds.num_points_per_pointcloud))
    print("recovered poses:", recovered_poses.shape)

    # 4. Evaluate against the dataset's ground-truth trajectory.
    print("ATE-RMSE:", np.asarray(ate_rmse(recovered_poses, rgbdimages.poses)))

    # 5. Export / visualize (requires plotly or open3d):
    #    pointclouds.plotly(0).show()
    #    o3d_pcd = pointclouds.open3d(0)


if __name__ == "__main__":
    main()
