"""Multi-host bootstrap helpers for pod-slice runs.

Net-new scope (SURVEY.md §2.9): the JAX-native distributed runtime setup.
On a TPU pod slice, every host runs the same program;
``initialize_multihost`` wires up ``jax.distributed`` (DCN rendezvous),
after which ``jax.devices()`` spans the whole slice and the mesh helpers
in :mod:`gradslam_tpu.parallel.mesh` build global meshes — collectives
ride ICI within the slice.

Typical pod entrypoint:

    from gradslam_tpu.parallel import multihost, make_mesh

    multihost.initialize_multihost()  # no args on Cloud TPU: auto-detect
    mesh = make_mesh(data=jax.device_count() // 2, map_=2)
    ...
"""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["initialize_multihost", "is_multihost", "host_summary"]


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initializes the JAX distributed runtime.

    With no arguments, relies on the TPU environment's auto-detection
    (Cloud TPU pod slices set the coordinator via metadata). Explicit
    arguments support bare-metal / DCN setups.

    Safe to call when already initialized (no-op) or on a single process
    (no-op when ``num_processes`` resolves to 1).
    """
    # NOTE: the guard must not touch the XLA backend — jax.process_count()
    # would initialise it, after which jax.distributed.initialize raises
    # ("must be called before any JAX calls"). Found by the two-process
    # rendezvous test (tests/parallel/test_multihost.py).
    if jax.distributed.is_initialized():
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        # single-process runs (tests, one host) hit "already initialized"
        # or missing-coordinator errors; both mean nothing to do
        if num_processes not in (None, 1):
            raise
        import logging

        logging.getLogger(__name__).debug(
            "jax.distributed.initialize skipped: %s", e
        )


def is_multihost() -> bool:
    """True when running across more than one host process."""
    return jax.process_count() > 1


def host_summary() -> str:
    """One-line description of the process/device topology."""
    return (
        f"process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global "
        f"devices ({jax.default_backend()})"
    )
