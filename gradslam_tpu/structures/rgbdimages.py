"""RGB-D frame structures (TPU-native).

The compute core is a set of pure, jit-safe functions over channels-last
arrays (the only on-device layout — TPU prefers trailing feature dims and
XLA handles the rest). The :class:`RGBDImages` class is a thin host-side
container offering the reference's API surface (lazy derived maps with
cache invalidation, frame indexing, channels-first views) on top of the
pure functions.

Reference parity: gradslam/structures/rgbdimages.py (vertex map :643,
global vertex map :681, normal map :710, global normal map :745).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..geometry import create_meshgrid, inverse_intrinsics

__all__ = [
    "valid_depth_mask",
    "compute_vertex_map",
    "compute_global_vertex_map",
    "compute_normal_map",
    "compute_global_normal_map",
    "RGBDImages",
]


def valid_depth_mask(depth_image: jnp.ndarray) -> jnp.ndarray:
    """Bool mask of pixels with valid (> 0) depth. Shape matches input.

    Reference parity: rgbdimages.py:320.
    """
    return depth_image > 0


def pixel_rays(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel grid ``[u(col), v(row), 1]`` of shape (H, W, 3).

    Matches the reference's ``pixel_pos`` construction
    (rgbdimages.py:648-661): x = column index, y = row index.
    """
    grid = create_meshgrid(height, width, normalized_coords=False)[0]  # (H, W, 2)
    return jnp.concatenate(
        [grid[..., 1:2], grid[..., 0:1], jnp.ones_like(grid[..., :1])], axis=-1
    ).astype(dtype)


def compute_vertex_map(
    depth_image: jnp.ndarray, intrinsics: jnp.ndarray
) -> jnp.ndarray:
    """Unprojects depth images into camera-frame vertex maps.

    ``v = depth * Kinv @ [u, v, 1]`` with invalid-depth pixels zeroed
    (reference rgbdimages.py:643-679; analytic ``inverse_intrinsics`` is used
    for numerical parity with golden data).

    Args:
        depth_image: (B, L, H, W, 1).
        intrinsics: (B, 1, 4, 4).

    Returns:
        (B, L, H, W, 3) vertex map.
    """
    B, L, H, W, _ = depth_image.shape
    rays = pixel_rays(H, W, depth_image.dtype)  # (H, W, 3)
    kinv = inverse_intrinsics(intrinsics)[..., :3, :3]  # (B, 1, 3, 3)
    # (B, 1, 3, 3) x (H, W, 3) -> (B, 1, H, W, 3); broadcast over L.
    vmap_rays = jnp.einsum(
        "bsjc,hwc->bshwj", kinv, rays, precision=jax.lax.Precision.HIGHEST
    )
    vertex = vmap_rays * depth_image  # (B, L, H, W, 3) via broadcast over L
    return vertex * valid_depth_mask(depth_image).astype(vertex.dtype)


def compute_global_vertex_map(
    vertex_map: jnp.ndarray,
    poses: Optional[jnp.ndarray],
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Transforms camera-frame vertex maps to world frame: ``R v + t``.

    Invalid-depth pixels stay zeroed (reference rgbdimages.py:681-708).

    Args:
        vertex_map: (B, L, H, W, 3).
        poses: (B, L, 4, 4) or None (returns vertex_map unchanged).
        mask: optional (B, L, H, W, 1) validity mask.
    """
    if poses is None:
        return vertex_map
    rmat = poses[..., :3, :3]
    tvec = poses[..., :3, 3]
    out = jnp.einsum(
        "bsjc,bshwc->bshwj",
        rmat,
        vertex_map,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = out + tvec[:, :, None, None, :]
    if mask is not None:
        out = out * mask.astype(out.dtype)
    return out


def compute_normal_map(
    vertex_map: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Estimates normals from vertex maps by forward differences.

    ``n = normalize(cross(d/du v, d/dv v))`` with the last row/column
    replicated and zero-norm guard ``where(norm == 0, 1, norm)``
    (reference rgbdimages.py:710-743).

    Args:
        vertex_map: (B, L, H, W, 3).
        mask: optional (B, L, H, W, 1) validity mask.
    """
    dh = jnp.diff(vertex_map, axis=-2)
    dh = jnp.concatenate([dh, dh[..., -1:, :]], axis=-2)
    dv = jnp.diff(vertex_map, axis=-3)
    dv = jnp.concatenate([dv, dv[..., -1:, :, :]], axis=-3)
    normal = jnp.cross(dh, dv)
    norm_sq = jnp.sum(normal * normal, axis=-1, keepdims=True)
    # Degenerate-pixel guard. The reference checks ``norm == 0`` exactly
    # (torch.cross of parallel vectors cancels exactly); under XLA's fused
    # multiply-add the cross of parallel vectors leaves ~1e-10 noise, so an
    # exact-zero test would normalize that noise into a garbage unit vector.
    # Test parallelism relatively instead: |dh x dv|^2 = |dh|^2|dv|^2 sin^2(t),
    # and sin^2(t) <= 1e-12 means exactly-parallel up to float32 noise. Those
    # pixels are zeroed, matching the reference's output bit-for-bit.
    dh_sq = jnp.sum(dh * dh, axis=-1, keepdims=True)
    dv_sq = jnp.sum(dv * dv, axis=-1, keepdims=True)
    degenerate = norm_sq <= 1e-12 * dh_sq * dv_sq
    # double-where: sqrt(0) has an infinite derivative, so the argument must
    # be guarded BEFORE sqrt or reverse-mode AD pollutes the whole map with
    # NaN cotangents even though `where` discards the primal value.
    norm = jnp.sqrt(jnp.where(degenerate, jnp.ones_like(norm_sq), norm_sq))
    normal = jnp.where(degenerate, jnp.zeros_like(normal), normal / norm)
    if mask is not None:
        normal = normal * mask.astype(normal.dtype)
    return normal


def compute_global_normal_map(
    normal_map: jnp.ndarray, poses: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Rotates normal maps into the world frame (rotation only).

    Reference parity: rgbdimages.py:745-763.
    """
    if poses is None:
        return normal_map
    rmat = poses[..., :3, :3]
    return jnp.einsum(
        "bsjc,bshwc->bshwj",
        rmat,
        normal_map,
        precision=jax.lax.Precision.HIGHEST,
    )


def _to_channels_last(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 1, 3, 4, 2))


def _to_channels_first(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 1, 4, 2, 3))


class RGBDImages:
    """A batch of RGB-D frame sequences.

    Host-side container over channels-last jnp arrays with lazily computed,
    cached derived maps (vertex/normal maps, local and global), mirroring
    the reference's API (gradslam/structures/rgbdimages.py:13). Instances
    are immutable from JAX's perspective: setters return caches to an
    invalidated state but arrays themselves are never mutated in place.

    Args:
        rgb_image: (B, L, H, W, 3) color (or (B, L, 3, H, W) when
            ``channels_first``).
        depth_image: (B, L, H, W, 1) depth (or (B, L, 1, H, W)).
        intrinsics: (B, 1, 4, 4) pinhole intrinsics.
        poses: optional (B, L, 4, 4) camera-to-world poses.
        channels_first: input (and output) layout flag. Internally data is
            always stored channels-last (the TPU-friendly layout).
    """

    def __init__(
        self,
        rgb_image,
        depth_image,
        intrinsics,
        poses=None,
        channels_first: bool = False,
    ):
        rgb_image = jnp.asarray(rgb_image)
        depth_image = jnp.asarray(depth_image)
        intrinsics = jnp.asarray(intrinsics)
        if poses is not None:
            poses = jnp.asarray(poses)
        if channels_first:
            rgb_image = _to_channels_last(rgb_image)
            depth_image = _to_channels_last(depth_image)
        if rgb_image.ndim != 5 or rgb_image.shape[-1] != 3:
            raise ValueError(
                f"rgb_image must be (B, L, H, W, 3), got {rgb_image.shape}"
            )
        if depth_image.ndim != 5 or depth_image.shape[-1] != 1:
            raise ValueError(
                f"depth_image must be (B, L, H, W, 1), got {depth_image.shape}"
            )
        if depth_image.shape[:4] != rgb_image.shape[:4]:
            raise ValueError(
                "rgb_image and depth_image batch/seq/spatial dims must match: "
                f"{rgb_image.shape} vs {depth_image.shape}"
            )
        if intrinsics.shape[-2:] != (4, 4) or intrinsics.ndim != 4:
            raise ValueError(
                f"intrinsics must be (B, 1, 4, 4), got {intrinsics.shape}"
            )
        if poses is not None and (
            poses.ndim != 4 or poses.shape[-2:] != (4, 4)
        ):
            raise ValueError(f"poses must be (B, L, 4, 4), got {poses.shape}")

        self._rgb = rgb_image
        self._depth = depth_image
        self._intrinsics = intrinsics
        self._poses = poses
        self.channels_first = bool(channels_first)
        self._cache: dict = {}

    # -- shape ----------------------------------------------------------
    @property
    def shape(self):
        B, L, H, W, _ = self._rgb.shape
        return (B, L, H, W)

    def __len__(self):
        return self._rgb.shape[0]

    @property
    def h(self):
        return self._rgb.shape[2]

    @property
    def w(self):
        return self._rgb.shape[3]

    @property
    def cdim(self):
        """Index of the channel dim in the active layout (reference
        rgbdimages.py: 2 when channels_first else 4)."""
        return 2 if self.channels_first else 4

    @property
    def pixel_pos(self):
        """(B, L, H, W, 3) homogeneous pixel positions ``[u, v, 1]``
        (reference rgbdimages.py:648-661), in the active layout."""
        B, L, H, W = self.shape
        rays = pixel_rays(H, W, self._rgb.dtype)  # (H, W, 3)
        pp = jnp.broadcast_to(rays[None, None], (B, L, H, W, 3))
        return self._layout(pp)

    # -- raw data -------------------------------------------------------
    def _layout(self, x):
        return _to_channels_first(x) if self.channels_first else x

    @property
    def rgb_image(self):
        return self._layout(self._rgb)

    @property
    def depth_image(self):
        return self._layout(self._depth)

    @property
    def intrinsics(self):
        return self._intrinsics

    @property
    def poses(self):
        return self._poses

    @poses.setter
    def poses(self, value):
        if value is not None:
            value = jnp.asarray(value)
            if value.ndim != 4 or value.shape[-2:] != (4, 4):
                raise ValueError(f"poses must be (B, L, 4, 4), got {value.shape}")
        self._poses = value
        # pose-dependent caches invalidate (reference rgbdimages.py:426-447)
        self._cache.pop("global_vertex_map", None)
        self._cache.pop("global_normal_map", None)

    @property
    def has_poses(self):
        return self._poses is not None

    # -- derived maps ---------------------------------------------------
    @property
    def valid_depth_mask(self):
        if "valid_depth_mask" not in self._cache:
            self._cache["valid_depth_mask"] = valid_depth_mask(self._depth)
        return self._layout(self._cache["valid_depth_mask"])

    @property
    def vertex_map(self):
        if "vertex_map" not in self._cache:
            self._cache["vertex_map"] = compute_vertex_map(
                self._depth, self._intrinsics
            )
        return self._layout(self._cache["vertex_map"])

    @property
    def global_vertex_map(self):
        if "global_vertex_map" not in self._cache:
            if "vertex_map" not in self._cache:
                _ = self.vertex_map
            self._cache["global_vertex_map"] = compute_global_vertex_map(
                self._cache["vertex_map"],
                self._poses,
                valid_depth_mask(self._depth),
            )
        return self._layout(self._cache["global_vertex_map"])

    @property
    def normal_map(self):
        if "normal_map" not in self._cache:
            if "vertex_map" not in self._cache:
                _ = self.vertex_map
            self._cache["normal_map"] = compute_normal_map(
                self._cache["vertex_map"], valid_depth_mask(self._depth)
            )
        return self._layout(self._cache["normal_map"])

    @property
    def global_normal_map(self):
        if "global_normal_map" not in self._cache:
            if "normal_map" not in self._cache:
                _ = self.normal_map
            self._cache["global_normal_map"] = compute_global_normal_map(
                self._cache["normal_map"], self._poses
            )
        return self._layout(self._cache["global_normal_map"])

    # -- views / conversion --------------------------------------------
    def __getitem__(self, index):
        """Slices over (batch, sequence), preserving dims (reference :185)."""
        if not isinstance(index, tuple):
            index = (index,)
        if len(index) > 2:
            raise IndexError("RGBDImages supports (batch, seq) indexing only")

        def _norm(i, size):
            if isinstance(i, int):
                if i < -size or i >= size:
                    raise IndexError(f"index {i} out of range for size {size}")
                i = i % size
                return slice(i, i + 1)
            return i

        b = _norm(index[0], self._rgb.shape[0])
        s = _norm(index[1], self._rgb.shape[1]) if len(index) == 2 else slice(None)
        return RGBDImages(
            self._rgb[b, s],
            self._depth[b, s],
            self._intrinsics[b],
            None if self._poses is None else self._poses[b, s],
        )

    def to_channels_last(self):
        out = RGBDImages(self._rgb, self._depth, self._intrinsics, self._poses)
        out._cache = dict(self._cache)
        return out

    def to_channels_first(self):
        out = RGBDImages(self._rgb, self._depth, self._intrinsics, self._poses)
        out.channels_first = True
        out._cache = dict(self._cache)
        return out

    def to_channels_last_(self):
        """In-place layout toggle (reference rgbdimages.py:575). Storage is
        always channels-last internally; only the view flag flips."""
        self.channels_first = False
        return self

    def to_channels_first_(self):
        """In-place layout toggle (reference rgbdimages.py:617)."""
        self.channels_first = True
        return self

    def to(self, device):
        """Moves all tensors to ``device`` (a jax.Device or platform str)."""
        if isinstance(device, str):
            device = jax.devices(device)[0]
        put = lambda x: None if x is None else jax.device_put(x, device)
        out = RGBDImages(
            put(self._rgb), put(self._depth), put(self._intrinsics),
            put(self._poses),
        )
        out.channels_first = self.channels_first
        return out

    def cpu(self):
        """Moves to the host CPU device."""
        return self.to("cpu")

    def cuda(self):
        """Moves to the first accelerator device (TPU here; named for
        reference API compatibility)."""
        return self.to(jax.devices()[0])

    def astype(self, dtype):
        out = RGBDImages(
            self._rgb.astype(dtype),
            self._depth.astype(dtype),
            self._intrinsics.astype(dtype),
            None if self._poses is None else self._poses.astype(dtype),
        )
        out.channels_first = self.channels_first
        return out

    def detach(self):
        out = RGBDImages(
            jax.lax.stop_gradient(self._rgb),
            jax.lax.stop_gradient(self._depth),
            jax.lax.stop_gradient(self._intrinsics),
            None
            if self._poses is None
            else jax.lax.stop_gradient(self._poses),
        )
        out.channels_first = self.channels_first
        return out

    def clone(self):
        out = RGBDImages(self._rgb, self._depth, self._intrinsics, self._poses)
        out.channels_first = self.channels_first
        out._cache = dict(self._cache)
        return out

    def plotly(self, index: int = 0, **kwargs):
        from ..viz import rgbd_plotly

        return rgbd_plotly(self, index, **kwargs)

    def __repr__(self):
        return (
            f"RGBDImages(shape={self.shape}, has_poses={self.has_poses}, "
            f"channels_first={self.channels_first})"
        )

    # -- pytree protocol (jit/vmap/scan-compatible) ---------------------
    def _tree_flatten(self):
        children = (self._rgb, self._depth, self._intrinsics, self._poses)
        return children, self.channels_first

    @classmethod
    def _tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._rgb, obj._depth, obj._intrinsics, obj._poses = children
        obj.channels_first = aux
        obj._cache = {}
        return obj


jax.tree_util.register_pytree_node(
    RGBDImages,
    lambda x: x._tree_flatten(),
    RGBDImages._tree_unflatten,
)
