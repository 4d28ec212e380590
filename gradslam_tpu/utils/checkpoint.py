"""Checkpoint / resume of SLAM state.

Net-new scope (the reference has none — SURVEY.md §5): all SLAM state is
(map arena, poses), both plain arrays, so checkpointing is a direct
serialization. Uses orbax when available (multi-host friendly), with an
npz fallback that covers single-host use.
"""

from __future__ import annotations

import pathlib
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..structures.maparena import MapState

__all__ = ["save_slam_state", "load_slam_state"]

_FIELDS = ("data", "num_points")


def save_slam_state(
    path: str,
    map_state: MapState,
    poses: Optional[jnp.ndarray] = None,
    use_orbax: bool = False,
) -> None:
    """Saves (map arena, poses) to ``path``.

    Args:
        path: target file (npz) or directory (orbax).
        use_orbax: use orbax-checkpoint (sharding-aware) instead of npz.
    """
    if use_orbax:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        state = {f: getattr(map_state, f) for f in _FIELDS}
        if poses is not None:
            state["poses"] = poses
        ckptr.save(pathlib.Path(path).absolute(), state)
        ckptr.wait_until_finished()
        return
    arrays = {f: np.asarray(getattr(map_state, f)) for f in _FIELDS}
    if poses is not None:
        arrays["poses"] = np.asarray(poses)
    np.savez_compressed(path, **arrays)


def load_slam_state(
    path: str, use_orbax: bool = False
) -> Tuple[MapState, Optional[jnp.ndarray]]:
    """Loads (map arena, poses) saved by :func:`save_slam_state`."""
    if use_orbax:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(pathlib.Path(path).absolute())
        poses = state.pop("poses", None)
        ms = MapState(**{f: jnp.asarray(state[f]) for f in _FIELDS})
        return ms, None if poses is None else jnp.asarray(poses)
    with np.load(path) as data:
        ms = MapState(**{f: jnp.asarray(data[f]) for f in _FIELDS})
        poses = jnp.asarray(data["poses"]) if "poses" in data else None
    return ms, poses
