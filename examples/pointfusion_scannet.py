"""PointFusion on ScanNet scenes (reference examples/pointfusion_scannet.py).

Example:
    python examples/pointfusion_scannet.py \
        --scannet_path extractions/scans \
        --scannet_meta_path extractions/sequence_associations \
        --odometry gradicp
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse

import numpy as np

from gradslam_tpu import PointFusion, RGBDImages
from gradslam_tpu.datasets import Scannet
from gradslam_tpu.metrics import ate_rmse

parser = argparse.ArgumentParser()
parser.add_argument("--scannet_path", required=True)
parser.add_argument("--scannet_meta_path", required=True)
parser.add_argument("--scenes", default=None, help="comma-separated scene names")
parser.add_argument(
    "--odometry", choices=["gt", "icp", "gradicp"], default="gradicp"
)
parser.add_argument("--start", type=int, default=0)
parser.add_argument("--end", type=int, default=16)
parser.add_argument("--height", type=int, default=240)
parser.add_argument("--width", type=int, default=320)
parser.add_argument("--plot", action="store_true")


def main():
    args = parser.parse_args()
    scenes = tuple(args.scenes.split(",")) if args.scenes else None
    dataset = Scannet(
        args.scannet_path,
        args.scannet_meta_path,
        scenes,
        start=args.start,
        end=args.end,
        height=args.height,
        width=args.width,
    )
    colors, depths, intrinsics, poses, *_ = dataset[0]
    rgbdimages = RGBDImages(
        colors[None], depths[None], intrinsics[None], poses[None]
    )
    slam = PointFusion(odom=args.odometry)
    pointclouds, recovered_poses = slam(rgbdimages)
    print(f"map points: {np.asarray(pointclouds.num_points_per_pointcloud)}")
    print(
        "ATE-RMSE vs dataset poses:",
        np.asarray(ate_rmse(recovered_poses, rgbdimages.poses)),
    )
    if args.plot:
        pointclouds.plotly(0).show()


if __name__ == "__main__":
    main()
