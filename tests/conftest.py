"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the JAX-native "fake backend"
analogue of the reference's cpu/cuda device parametrization — see SURVEY.md
§4). Set GRADSLAM_TPU_TEST_REAL=1 to run against the real attached backend
instead.
"""

import os
import pathlib as _pathlib

# Persistent XLA compilation cache: the suite compiles hundreds of
# near-identical SLAM programs; caching them on disk makes re-runs (and
# the second xdist worker) skip the compile entirely. Scoped to the repo
# so it never pollutes the user's environment; safe to delete anytime.
_CACHE_DIR = _pathlib.Path(__file__).parent.parent / ".jax_compile_cache"

if not os.environ.get("GRADSLAM_TPU_TEST_REAL"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The environment's sitecustomize force-registers a remote TPU backend
    # at interpreter start; the env var alone is not enough to undo that.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pathlib

import numpy as np
import pytest

DATA_DIR = pathlib.Path(__file__).parent / "data"


def pytest_configure(config):
    # Real-TPU runs must be serial: the attached chip is single-tenant and
    # two xdist workers would race it (pyproject addopts default to -n 2
    # for the CPU suite). Conftest hooks run before plugin hooks, so
    # zeroing the option here disables xdist before it activates.
    if os.environ.get("GRADSLAM_TPU_TEST_REAL") and getattr(
        config.option, "numprocesses", None
    ):
        config.option.numprocesses = 0
        config.option.dist = "no"


@pytest.fixture(scope="session")
def msrd_data():
    """Golden RGB-D fixture: B=2, L=3, 120x160 clip with precomputed maps.

    Mirrors the reference's load_test_data (tests/common.py:20-39): raw
    colors (0-255 floats), channels-last.
    """
    d = DATA_DIR / "msrd_b2s3"
    out = {}
    for name in (
        "colors",
        "depths",
        "intrinsics",
        "poses",
        "vertex_map",
        "normal_map",
        "global_vertex_map",
        "global_normal_map",
    ):
        out[name] = np.load(d / f"{name}.npy").astype(np.float32)
    return out
