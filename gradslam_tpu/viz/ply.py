"""Dependency-free PLY export for pointclouds.

The reference exports maps through open3d only; a plain binary PLY writer
makes map dumps possible on headless TPU hosts with no viz stack.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["write_ply", "pointclouds_to_ply"]


def write_ply(
    path: str,
    points: np.ndarray,
    normals: np.ndarray | None = None,
    colors: np.ndarray | None = None,
) -> None:
    """Writes an (N, 3) pointcloud to a binary little-endian PLY file.

    Args:
        points: (N, 3) float positions.
        normals: optional (N, 3) float normals.
        colors: optional (N, 3) colors in [0, 1] or [0, 255].
    """
    points = np.asarray(points, dtype=np.float32)
    if points.ndim != 2 or points.shape[1] != 3:
        raise ValueError(f"points must be (N, 3), got {points.shape}")
    n = len(points)

    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {a}" for a in "xyz"]
    cols = None
    if normals is not None:
        normals = np.asarray(normals, dtype=np.float32)
        header += [f"property float n{a}" for a in "xyz"]
    if colors is not None:
        cols = np.asarray(colors, dtype=np.float32)
        if cols.size and cols.max() <= 1.5:
            cols = cols * 255.0
        cols = np.clip(cols, 0, 255).astype(np.uint8)
        header += [f"property uchar {c}" for c in ("red", "green", "blue")]
    header.append("end_header")

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        for i in range(n):
            f.write(struct.pack("<3f", *points[i]))
            if normals is not None:
                f.write(struct.pack("<3f", *normals[i]))
            if cols is not None:
                f.write(struct.pack("<3B", *cols[i]))


def pointclouds_to_ply(pointclouds, path: str, index: int = 0) -> None:
    """Exports one batch element of a Pointclouds to a PLY file."""
    pts = np.asarray(pointclouds.points_list[index])
    nrm = (
        np.asarray(pointclouds.normals_list[index])
        if pointclouds.has_normals
        else None
    )
    col = (
        np.asarray(pointclouds.colors_list[index])
        if pointclouds.has_colors
        else None
    )
    write_ply(path, pts, nrm, col)
