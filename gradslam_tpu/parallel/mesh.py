"""Device mesh helpers for multi-chip SLAM.

The reference is strictly single-process/single-device (SURVEY.md §2.9);
everything here is net-new TPU scope. The scaling recipe: pick a mesh,
annotate shardings with NamedSharding/PartitionSpec, and let XLA insert
the collectives (psum/all-gather ride ICI within a slice).

Axes:
  - ``data``: batch-of-sequences data parallelism.
  - ``map``: map-arena point-dimension model parallelism (the arena is the
    big state; association/fusion shard over its capacity dim).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "shard_map_state", "P", "NamedSharding"]


def make_mesh(
    data: Optional[int] = None,
    map_: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Creates a (data, map) mesh over the available devices.

    Defaults to all devices on the data axis. ``data * map_`` must equal
    the device count.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None and map_ is None:
        data, map_ = n, 1
    elif data is None:
        data = n // map_
    elif map_ is None:
        map_ = n // data
    if data * map_ != n:
        raise ValueError(
            f"mesh shape data={data} x map={map_} != device count {n}"
        )
    dev_array = np.asarray(devices).reshape(data, map_)
    return Mesh(dev_array, ("data", "map"))


def shard_batch(mesh: Mesh, tree):
    """Shards leading (batch) dim of every array in a pytree over 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def shard_map_state(mesh: Mesh, map_state):
    """Shards a MapState: batch over 'data', arena capacity over 'map'."""
    s_data = NamedSharding(mesh, P("data", "map"))
    s_cnt = NamedSharding(mesh, P("data"))
    return type(map_state)(
        data=jax.device_put(map_state.data, s_data),
        num_points=jax.device_put(map_state.num_points, s_cnt),
    )
