"""Generates the Jupyter tutorial notebooks (examples/tutorials/*.ipynb)
from declarative cell lists — the reference ships tutorials as notebooks
(reference examples/tutorials/), so this repo does too; the sibling .py
scripts remain the CI-runnable form.

Usage: python tools/make_tutorials.py [--execute]
"""

import argparse
import pathlib

import nbformat as nbf

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = ROOT / "examples" / "tutorials"

POINTFUSION = [
    ("md", """# PointFusion SLAM end to end

Differentiable dense RGB-D SLAM on TPU: load a batch of RGB-D sequences,
run `PointFusion` (gradICP odometry + point-based fusion, Keller et al.
2013), and evaluate the recovered trajectory. Uses the golden RGB-D clip
shipped with the tests — no dataset download needed.

The reference equivalent is gradslam's `pointfusion_tutorial.ipynb`;
here the whole sequence runs as ONE compiled XLA program
(`lax.scan` over frames, fixed-capacity map arena)."""),
    ("code", """import pathlib, sys
# running from a repo checkout (skip when gradslam_tpu is pip-installed)
sys.path.insert(0, str(pathlib.Path.cwd().parents[1]))
import numpy as np

from gradslam_tpu import PointFusion, RGBDImages
from gradslam_tpu.metrics import ate_rmse

DATA = pathlib.Path("../../tests/data/msrd_b2s3")"""),
    ("md", """## 1. Load a batch of RGB-D sequences

Shapes: colors `(B, L, H, W, 3)`, depths `(B, L, H, W, 1)`,
intrinsics `(B, 1, 4, 4)`, poses `(B, L, 4, 4)`."""),
    ("code", """colors = np.load(DATA / "colors.npy")
depths = np.load(DATA / "depths.npy")
intrinsics = np.load(DATA / "intrinsics.npy")
poses = np.load(DATA / "poses.npy")
colors.shape, depths.shape"""),
    ("md", """## 2. Wrap them as `RGBDImages`

Derived maps (vertex/normal, local and global) are computed lazily and
cached."""),
    ("code", """rgbdimages = RGBDImages(colors, depths, intrinsics, poses)
print("vertex map:", rgbdimages.vertex_map.shape)
print("normal map:", rgbdimages.normal_map.shape)"""),
    ("md", """## 3. Run PointFusion

gradICP odometry (the gradSLAM paper's differentiable LM) + per-pixel
projective data association + confidence-weighted fusion."""),
    ("code", """slam = PointFusion(odom="gradicp", numiters=10)
pointclouds, recovered_poses = slam(rgbdimages)
print("map points per batch:",
      np.asarray(pointclouds.num_points_per_pointcloud))
print("recovered poses:", recovered_poses.shape)"""),
    ("md", "## 4. Evaluate against the ground-truth trajectory"),
    ("code", """print("ATE-RMSE:", np.asarray(ate_rmse(recovered_poses, rgbdimages.poses)))"""),
    ("md", """## 5. Export / visualize

With plotly or open3d installed:

```python
pointclouds.plotly(0).show()
o3d_pcd = pointclouds.open3d(0)
```

Dependency-free binary PLY export always works:

```python
from gradslam_tpu.viz.ply import write_ply
write_ply("map0.ply", *pointclouds.numpy(0))
```"""),
]

STRUCTURES = [
    ("md", """# RGBDImages and Pointclouds

The two core data structures (mirroring the reference's structures
tutorials): batched RGB-D frame sequences with lazy derived maps, and
batches of variable-length pointclouds (padded + mask on device)."""),
    ("code", """import pathlib, sys
# running from a repo checkout (skip when gradslam_tpu is pip-installed)
sys.path.insert(0, str(pathlib.Path.cwd().parents[1]))
import jax.numpy as jnp
import numpy as np

from gradslam_tpu import Pointclouds, RGBDImages
from gradslam_tpu.geometry import se3_exp
from gradslam_tpu.structures import pointclouds_from_rgbdimages

DATA = pathlib.Path("../../tests/data/msrd_b2s3")"""),
    ("md", "## RGBDImages"),
    ("code", """colors = np.load(DATA / "colors.npy")
depths = np.load(DATA / "depths.npy")
intrinsics = np.load(DATA / "intrinsics.npy")
poses = np.load(DATA / "poses.npy")
rgbd = RGBDImages(colors, depths, intrinsics, poses)
print("shape (B, L, H, W):", rgbd.shape)"""),
    ("md", "Lazy derived maps — computed on first access, cached after:"),
    ("code", """print("valid pixels:", int(np.asarray(rgbd.valid_depth_mask).sum()))
print("vertex map:", rgbd.vertex_map.shape)
print("global normal map:", rgbd.global_normal_map.shape)"""),
    ("md", "`(batch, time)` indexing keeps dims; channel layout toggles:"),
    ("code", """frame = rgbd[0, 1]
print("one frame:", frame.shape)
print("channels-first rgb:", rgbd.to_channels_first().rgb_image.shape)"""),
    ("md", """## Pointclouds

Construct from ragged per-cloud arrays (list form); on device the
representation is padded + mask."""),
    ("code", """rng = np.random.RandomState(0)
pc = Pointclouds(
    points=[rng.randn(100, 3).astype(np.float32),
            rng.randn(60, 3).astype(np.float32)],
    colors=[rng.rand(100, 3).astype(np.float32),
            rng.rand(60, 3).astype(np.float32)],
)
pc"""),
    ("md", """Arithmetic and rigid-transform ops are functional (return new
objects):"""),
    ("code", """moved = (pc + jnp.asarray([1.0, 0, 0])) * 2.0
T = se3_exp(jnp.asarray([0.1, 0, 0, 0, 0, 0.3]))
transformed = pc.transform(T)
print("transformed first point:",
      np.asarray(transformed.points_padded[0, 0]))"""),
    ("md", """Build a world-frame cloud from one RGB-D frame (invalid depths
filtered per batch item):"""),
    ("code", """frame_pc = pointclouds_from_rgbdimages(rgbd[:, 0])
print("frame cloud sizes:",
      np.asarray(frame_pc.num_points_per_pointcloud))"""),
]


def build(cells):
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    nb.metadata["language_info"] = {"name": "python"}
    for kind, src in cells:
        if kind == "md":
            nb.cells.append(nbf.v4.new_markdown_cell(src))
        else:
            nb.cells.append(nbf.v4.new_code_cell(src))
    return nb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--execute", action="store_true")
    args = ap.parse_args()
    OUT.mkdir(parents=True, exist_ok=True)
    for name, cells in [
        ("pointfusion_tutorial", POINTFUSION),
        ("structures_tutorial", STRUCTURES),
    ]:
        nb = build(cells)
        if args.execute:
            from nbclient import NotebookClient

            NotebookClient(
                nb, timeout=600, resources={"metadata": {"path": str(OUT)}}
            ).execute()
        path = OUT / f"{name}.ipynb"
        nbf.write(nb, str(path))
        print("wrote", path)


if __name__ == "__main__":
    main()
