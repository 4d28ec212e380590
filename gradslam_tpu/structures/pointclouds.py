"""Batched pointclouds (TPU-native).

The reference keeps a dual list/padded representation with lazy two-way
conversion (gradslam/structures/pointclouds.py:13). On TPU only the padded
(+ validity mask) form exists on device — static shapes are an XLA
requirement — and the "list" view is a host/numpy boundary convenience.

All operators are functional: they return new :class:`Pointclouds`
(trailing-underscore mutators from the reference map to plain functional
methods; JAX donation replaces in-place semantics).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import project_points, transform_normals, transform_pointcloud
from ..geometry.projutils import homogenize_points

__all__ = ["Pointclouds"]

_ATTRS = ("points", "normals", "colors", "features")


def _pad_list(tensors: Sequence, feat_dim: Optional[int] = None):
    """Stacks a list of (N_b, C) arrays into (B, maxN, C) + counts."""
    arrays = [np.asarray(t) for t in tensors]
    for a in arrays:
        if a.ndim != 2:
            raise ValueError(f"each element must be 2D (N, C), got shape {a.shape}")
    if feat_dim is not None and any(a.shape[1] != feat_dim for a in arrays):
        raise ValueError(f"expected last dim {feat_dim}")
    counts = np.array([a.shape[0] for a in arrays], dtype=np.int32)
    max_n = int(counts.max()) if len(counts) else 0
    C = arrays[0].shape[1] if arrays else (feat_dim or 3)
    out = np.zeros((len(arrays), max_n, C), dtype=np.float32)
    for b, a in enumerate(arrays):
        out[b, : a.shape[0]] = a
    return jnp.asarray(out), jnp.asarray(counts)


class Pointclouds:
    """A batch of B variable-length pointclouds with optional attributes.

    Stores points/normals/colors as (B, N, 3) and features as (B, N, C)
    zero-padded device arrays plus per-cloud counts. Parity surface with
    the reference (pointclouds.py:13): indexing, arithmetic offset/scale
    ops, ``@`` SE(3)/SO(3) post-multiplication, transform/rotate,
    pinhole projection, append, clone/detach, list/padded accessors,
    open3d/plotly export.

    Construct from either a list of per-cloud arrays (ragged) or padded
    arrays with explicit ``num_points``.
    """

    def __init__(
        self,
        points=None,
        normals=None,
        colors=None,
        features=None,
        *,
        num_points=None,
    ):
        if points is None:
            # empty batch (reference allows Pointclouds() as the empty map)
            self._points = jnp.zeros((0, 0, 3))
            self._normals = None
            self._colors = None
            self._features = None
            self._num_points = jnp.zeros((0,), dtype=jnp.int32)
            return

        if isinstance(points, (list, tuple)):
            pts, counts = _pad_list(points, 3)
            if num_points is not None:
                raise ValueError("num_points only valid with padded input")
            self._points, self._num_points = pts, counts
            cap = pts.shape[1]

            def _opt(x, dim):
                if x is None:
                    return None
                arr, c2 = _pad_list(x, dim)
                if arr.shape[1] != cap:
                    pad = cap - arr.shape[1]
                    arr = jnp.pad(arr, ((0, 0), (0, pad), (0, 0)))
                if not bool(jnp.all(c2 == counts)):
                    raise ValueError("attribute counts must match point counts")
                return arr

            self._normals = _opt(normals, 3)
            self._colors = _opt(colors, 3)
            self._features = _opt(features, None)
        else:
            points = jnp.asarray(points)
            if points.ndim != 3 or points.shape[-1] != 3:
                raise ValueError(f"padded points must be (B, N, 3), got {points.shape}")
            self._points = points
            B, N = points.shape[:2]
            if num_points is None:
                num_points = jnp.full((B,), N, dtype=jnp.int32)
            self._num_points = jnp.asarray(num_points, dtype=jnp.int32)

            def _chk(x, name):
                if x is None:
                    return None
                x = jnp.asarray(x)
                if x.shape[:2] != (B, N):
                    raise ValueError(
                        f"{name} must be ({B}, {N}, C), got {x.shape}"
                    )
                return x

            self._normals = _chk(normals, "normals")
            self._colors = _chk(colors, "colors")
            self._features = _chk(features, "features")

    # ------------------------------------------------------------------
    @classmethod
    def _from_padded(cls, points, normals, colors, features, num_points):
        out = cls.__new__(cls)
        out._points = points
        out._normals = normals
        out._colors = colors
        out._features = features
        out._num_points = num_points
        return out

    def _map_attrs(self, fn_points, fn_vectors=None, fn_features=None):
        """Returns a new Pointclouds with fn applied to each attribute."""
        fn_vectors = fn_vectors if fn_vectors is not None else fn_points
        fn_features = fn_features if fn_features is not None else (lambda x: x)
        return Pointclouds._from_padded(
            fn_points(self._points),
            None if self._normals is None else fn_vectors(self._normals),
            None if self._colors is None else fn_features(self._colors),
            None if self._features is None else fn_features(self._features),
            self._num_points,
        )

    # -- basic queries ---------------------------------------------------
    def __len__(self):
        return self._points.shape[0]

    @property
    def capacity(self):
        return self._points.shape[1]

    @property
    def has_points(self):
        return self._points.shape[0] > 0 and bool(jnp.any(self._num_points > 0))

    @property
    def has_normals(self):
        return self._normals is not None

    @property
    def has_colors(self):
        return self._colors is not None

    @property
    def has_features(self):
        return self._features is not None

    @property
    def equisized(self):
        if len(self) == 0:
            return True
        return bool(jnp.all(self._num_points == self._num_points[0]))

    @property
    def num_points_per_pointcloud(self):
        return self._num_points

    @property
    def num_features(self):
        """Feature channel count (0 when absent) — reference :669."""
        return 0 if self._features is None else self._features.shape[-1]

    @property
    def nonpad_mask(self):
        """(B, N) bool mask of valid (non-padding) entries."""
        B, N = self._points.shape[:2]
        return (
            jnp.arange(N, dtype=jnp.int32)[None, :] < self._num_points[:, None]
        )

    # -- padded accessors ------------------------------------------------
    @property
    def points_padded(self):
        return self._points

    @property
    def normals_padded(self):
        return self._normals

    @property
    def colors_padded(self):
        return self._colors

    @property
    def features_padded(self):
        return self._features

    def _assert_set_padded(self, value, expect_dim=None):
        """Validates a padded-attribute assignment: shape match and zeroed
        padding (reference pointclouds.py:1385-1427). The padding check is
        a host-side assertion and is skipped for traced values."""
        value = jnp.asarray(value)
        if value.ndim != 3 or value.shape[:2] != self._points.shape[:2]:
            raise ValueError(
                f"padded value must be ({self._points.shape[0]}, "
                f"{self._points.shape[1]}, C), got {value.shape}"
            )
        if expect_dim is not None and value.shape[2] != expect_dim:
            raise ValueError(
                f"expected last dim {expect_dim}, got {value.shape[2]}"
            )
        if isinstance(value, jax.core.Tracer):
            return value
        pad = np.asarray(value)[~np.asarray(self.nonpad_mask)]
        if pad.size and not (pad == 0).all():
            raise ValueError(
                "padded values must be zero outside nonpad_mask"
            )
        return value

    @points_padded.setter
    def points_padded(self, value):
        self._points = self._assert_set_padded(value, 3)

    @normals_padded.setter
    def normals_padded(self, value):
        self._normals = self._assert_set_padded(value, 3)

    @colors_padded.setter
    def colors_padded(self, value):
        self._colors = self._assert_set_padded(value, 3)

    @features_padded.setter
    def features_padded(self, value):
        self._features = self._assert_set_padded(value)

    # -- list accessors (host boundary) ----------------------------------
    def _to_list(self, padded):
        if padded is None:
            return None
        counts = np.asarray(self._num_points)
        arr = np.asarray(padded)
        return [jnp.asarray(arr[b, : counts[b]]) for b in range(len(self))]

    @property
    def points_list(self) -> Optional[List]:
        return self._to_list(self._points)

    @property
    def normals_list(self):
        return self._to_list(self._normals)

    @property
    def colors_list(self):
        return self._to_list(self._colors)

    @property
    def features_list(self):
        return self._to_list(self._features)

    # -- indexing --------------------------------------------------------
    def __getitem__(self, index):
        if isinstance(index, int):
            index = slice(index, index + 1) if index != -1 else slice(-1, None)
        if not isinstance(index, slice):
            raise IndexError("Pointclouds supports int/slice batch indexing")
        return Pointclouds._from_padded(
            self._points[index],
            None if self._normals is None else self._normals[index],
            None if self._colors is None else self._colors[index],
            None if self._features is None else self._features[index],
            self._num_points[index],
        )

    # -- arithmetic ops (offset / scale, reference :300-:334) ------------
    def _points_only(self, fn):
        mask = self.nonpad_mask[..., None].astype(self._points.dtype)
        return Pointclouds._from_padded(
            fn(self._points) * mask,
            self._normals,
            self._colors,
            self._features,
            self._num_points,
        )

    def offset(self, offset):
        return self._points_only(lambda p: p + offset)

    def __add__(self, other):
        return self.offset(other)

    def __sub__(self, other):
        return self.offset(-jnp.asarray(other))

    def scale(self, scale):
        return self._points_only(lambda p: p * scale)

    def __mul__(self, other):
        return self.scale(other)

    def __truediv__(self, other):
        return self.scale(1.0 / jnp.asarray(other))

    def __matmul__(self, transform):
        """Post-multiplies points by a (3, 3) or (4, 4) matrix (reference :353)."""
        transform = jnp.asarray(transform)
        if transform.shape[-2:] == (3, 3):
            fn = lambda p: jnp.matmul(p, transform)
        elif transform.shape[-2:] == (4, 4):
            fn = lambda p: jnp.matmul(homogenize_points(p), transform)[..., :3]
        else:
            raise ValueError(f"transform must be (3,3) or (4,4), got {transform.shape}")
        mask = self.nonpad_mask[..., None].astype(self._points.dtype)
        return Pointclouds._from_padded(
            fn(self._points) * mask,
            None if self._normals is None else self._normals,
            self._colors,
            self._features,
            self._num_points,
        )

    # -- rigid transforms (reference rotate_/transform_ :466/:526) -------
    def rotate(self, rmat):
        """Rotates points and normals by a (3, 3) or (B, 3, 3) matrix."""
        rmat = jnp.asarray(rmat)
        if rmat.shape[-2:] != (3, 3):
            raise ValueError(f"rmat must be (..., 3, 3), got {rmat.shape}")
        if rmat.ndim == 2:
            rmat = rmat[None]
        mask = self.nonpad_mask[..., None].astype(self._points.dtype)
        rot = lambda x: jnp.einsum("bij,bnj->bni", rmat, x)
        return Pointclouds._from_padded(
            rot(self._points) * mask,
            None if self._normals is None else rot(self._normals) * mask,
            self._colors,
            self._features,
            self._num_points,
        )

    def transform(self, transform):
        """Applies a (4, 4) or (B, 4, 4) rigid transform to points (and
        rotates normals)."""
        transform = jnp.asarray(transform)
        if transform.shape[-2:] != (4, 4):
            raise ValueError(f"transform must be (..., 4, 4), got {transform.shape}")
        if transform.ndim == 2:
            transform = transform[None]
        mask = self.nonpad_mask[..., None].astype(self._points.dtype)
        pts = transform_pointcloud(self._points, transform) * mask
        nrm = (
            None
            if self._normals is None
            else transform_normals(self._normals, transform) * mask
        )
        return Pointclouds._from_padded(
            pts, nrm, self._colors, self._features, self._num_points
        )

    def pinhole_projection(self, intrinsics):
        """Projects points onto the z=1 image plane (reference :575).

        Points become ``[u, v, 1]`` homogeneous pixel coords; padding stays
        zeroed.
        """
        intrinsics = jnp.asarray(intrinsics)
        uv = project_points(self._points, intrinsics)
        mask = self.nonpad_mask[..., None].astype(self._points.dtype)
        pts = homogenize_points(uv) * mask
        return Pointclouds._from_padded(
            pts, self._normals, self._colors, self._features, self._num_points
        )

    # reference-name aliases (functional, not in-place)
    rotate_ = rotate
    transform_ = transform
    pinhole_projection_ = pinhole_projection
    offset_ = offset
    scale_ = scale

    # -- append ----------------------------------------------------------
    def append_points(self, other: "Pointclouds") -> "Pointclouds":
        """Appends another batch of pointclouds per batch element.

        Functional equivalent of the reference's in-place append
        (pointclouds.py:1117): output capacity grows to the worst-case
        combined count; each attribute present in both inputs is carried
        (attributes present in only one input are dropped, matching the
        reference's requirement that both have the same attributes).
        """
        if len(other) != len(self):
            if len(self) == 0:
                return other.clone()
            raise ValueError(
                f"batch sizes must match: {len(self)} vs {len(other)}"
            )
        B = len(self)
        new_counts = self._num_points + other._num_points
        cap = int(np.asarray(jnp.max(new_counts))) if B else 0

        def _combine(a, b):
            if a is None or b is None:
                return None
            C = a.shape[-1]
            out = np.zeros((B, cap, C), dtype=np.asarray(a).dtype)
            an, bn = np.asarray(self._num_points), np.asarray(other._num_points)
            a, b = np.asarray(a), np.asarray(b)
            for i in range(B):
                out[i, : an[i]] = a[i, : an[i]]
                out[i, an[i] : an[i] + bn[i]] = b[i, : bn[i]]
            return jnp.asarray(out)

        return Pointclouds._from_padded(
            _combine(self._points, other._points),
            _combine(self._normals, other._normals),
            _combine(self._colors, other._colors),
            _combine(self._features, other._features),
            new_counts,
        )

    # -- functional clones ----------------------------------------------
    def clone(self):
        return Pointclouds._from_padded(
            self._points,
            self._normals,
            self._colors,
            self._features,
            self._num_points,
        )

    def detach(self):
        sg = jax.lax.stop_gradient
        return Pointclouds._from_padded(
            sg(self._points),
            None if self._normals is None else sg(self._normals),
            None if self._colors is None else sg(self._colors),
            None if self._features is None else sg(self._features),
            self._num_points,
        )

    def astype(self, dtype):
        cast = lambda x: None if x is None else x.astype(dtype)
        return Pointclouds._from_padded(
            cast(self._points),
            cast(self._normals),
            cast(self._colors),
            cast(self._features),
            self._num_points,
        )

    # -- device movement (reference to/cpu/cuda, pointclouds.py:1027-1115;
    #    JAX devices replace torch's cpu/cuda split) ----------------------
    def to(self, device):
        """Moves all tensors to ``device`` (a jax.Device or platform str)."""
        if isinstance(device, str):
            device = jax.devices(device)[0]
        put = lambda x: None if x is None else jax.device_put(x, device)
        return Pointclouds._from_padded(
            put(self._points),
            put(self._normals),
            put(self._colors),
            put(self._features),
            put(self._num_points),
        )

    def cpu(self):
        """Moves to the host CPU device."""
        return self.to("cpu")

    def cuda(self):
        """Moves to the first accelerator device (TPU here; named for
        reference API compatibility)."""
        return self.to(jax.devices()[0])

    # -- viz export ------------------------------------------------------
    def open3d(self, index: int = 0):
        from ..viz import pointclouds_open3d

        return pointclouds_open3d(self, index)

    def plotly(self, index: int = 0, **kwargs):
        from ..viz import pointclouds_plotly

        return pointclouds_plotly(self, index, **kwargs)

    def __repr__(self):
        return (
            f"Pointclouds(B={len(self)}, capacity={self.capacity}, "
            f"num_points={np.asarray(self._num_points).tolist()}, "
            f"normals={self.has_normals}, colors={self.has_colors}, "
            f"features={self.has_features})"
        )
