"""Virtual-device provisioning for multi-chip code paths.

Multi-device programs (sharded SLAM, the driver's multi-chip dry run,
scaling benches) are validated on hosts that have one real chip — or
none — by multiplying CPU devices via XLA's
``--xla_force_host_platform_device_count`` flag. Three things make this
fiddly on this backend, so the dance lives in one place:

- the flag only applies to the **cpu** platform;
- ``JAX_PLATFORMS=cpu`` as an env var can be overridden by a
  sitecustomize that force-registers a remote accelerator plugin, so the
  platform must be forced via ``jax.config``;
- both the flag and the platform choice are read at backend
  initialization, and *querying* ``jax.devices()`` initializes the
  backend — so the check must peek at the bridge's backend cache
  instead of querying.
"""

import os
import re

_FLAG = "xla_force_host_platform_device_count"


def backend_initialized() -> bool:
    """True once any JAX backend client has been created (after which
    platform/flag changes no longer take effect).

    Peeks at ``jax._src.xla_bridge._backends`` — a private cache (there
    is no public "is the backend up yet" API precisely because querying
    it would initialize it). Guarded: if a JAX upgrade renames the
    attribute, raise loudly instead of silently returning False and
    letting the caller mutate XLA_FLAGS ineffectively.
    """
    from jax._src import xla_bridge as _xb

    if not hasattr(_xb, "_backends"):
        import jax

        raise RuntimeError(
            "jax._src.xla_bridge._backends not found (JAX "
            f"{jax.__version__} renamed the private backend cache); "
            "update gradslam_tpu.utils.devices.backend_initialized for "
            "this JAX version"
        )
    return bool(_xb._backends)


def force_virtual_cpu_devices(n: int) -> None:
    """Ensures JAX exposes at least ``n`` devices, provisioning ``n``
    virtual CPU devices when the backend is not yet initialized.

    - Backend already initialized with >= ``n`` devices (a real
      multi-chip backend, or a test process that already forced a
      virtual mesh): no-op — those devices are used as-is.
    - Backend already initialized with fewer: raises (too late to fix).
    - Backend not initialized: raises an existing smaller device-count
      flag to ``n`` (never lowers a larger one) and switches the
      platform to cpu, then verifies.
    """
    import jax

    if backend_initialized():
        if len(jax.devices()) < n:
            raise RuntimeError(
                f"need {n} devices, have {len(jax.devices())} "
                f"({jax.default_backend()}); force_virtual_cpu_devices "
                "must run before the JAX backend initializes"
            )
        return

    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(rf"--{_FLAG}=(\d+)", flags)
    if m is None:
        flags = (flags + f" --{_FLAG}={n}").strip()
    elif int(m.group(1)) < n:
        flags = re.sub(rf"--{_FLAG}=\d+", f"--{_FLAG}={n}", flags)
    os.environ["XLA_FLAGS"] = flags
    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < n:
        raise RuntimeError(
            f"requested {n} virtual CPU devices, got "
            f"{len(jax.devices())} ({jax.default_backend()})"
        )
