"""Profiling helpers.

Net-new scope (the reference has no profiling hooks — SURVEY.md §5):
thin wrappers over ``jax.profiler`` plus a host-side timer that forces
device synchronization via host fetch (reliable on every backend,
including remote ones where ``block_until_ready`` may be a no-op).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["trace", "annotate", "DeviceTimer", "sync"]


def sync(tree) -> None:
    """Forces completion of all computations producing ``tree`` by fetching
    one element of each leaf to host."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "addressable_data"):
            _ = jax.device_get(leaf.ravel()[0] if leaf.size else leaf)


@contextlib.contextmanager
def trace(log_dir: str):
    """Captures a jax.profiler trace (view with TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span (context manager) for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class DeviceTimer:
    """Walltime timer with device synchronization.

    Example:
        >>> with DeviceTimer("fusion") as t:
        ...     out = step(x)
        ...     t.sync(out)
        >>> t.elapsed
    """

    def __init__(self, name: str = "", verbose: bool = False):
        self.name = name
        self.verbose = verbose
        self.elapsed: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def sync(self, tree):
        sync(tree)

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.verbose:
            print(f"[{self.name}] {self.elapsed * 1e3:.2f} ms")
        return False
