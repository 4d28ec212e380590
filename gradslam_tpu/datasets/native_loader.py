"""ctypes binding for the native (C++) batch frame loader.

The C++ library (native/loader.cpp) implements threaded PNG/JPEG decode +
resize + scaling — the host-side hot path of the input pipeline. This
module builds it on first use (g++ + libpng/libjpeg) and exposes numpy
batch loading; the Python loaders fall back to imageio/cv2 when the
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

__all__ = ["native_available", "load_color_batch", "load_depth_batch"]

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libgsloader.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "libgsloader.so"],
            cwd=_NATIVE_DIR,
            check=True,
            capture_output=True,
            timeout=240,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.gs_load_color_batch.restype = ctypes.c_int
        lib.gs_load_color_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
        ]
        lib.gs_load_depth_batch.restype = ctypes.c_int
        lib.gs_load_depth_batch.argtypes = lib.gs_load_color_batch.argtypes
        _lib = lib
        return _lib


def native_available() -> bool:
    """True when the native loader library is (or can be) built."""
    return _load() is not None


def _paths_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [str(p).encode() for p in paths]
    return arr


def load_color_batch(
    paths: Sequence[str], height: int, width: int, normalize: bool = False
) -> Optional[np.ndarray]:
    """Loads color images into (N, H, W, 3) float32 via the native loader.

    Returns None when the native library is unavailable (callers fall back
    to the Python path). Raises on decode failure.
    """
    lib = _load()
    if lib is None:
        return None
    out = np.empty((len(paths), height, width, 3), dtype=np.float32)
    rc = lib.gs_load_color_batch(
        _paths_array(paths),
        len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height,
        width,
        1.0 / 255.0 if normalize else 1.0,
    )
    if rc:
        raise IOError(f"native loader failed on {paths[rc - 1]}")
    return out


def load_depth_batch(
    paths: Sequence[str], height: int, width: int, depth_scale: float
) -> Optional[np.ndarray]:
    """Loads 16-bit depth PNGs into (N, H, W, 1) float32 / depth_scale."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((len(paths), height, width), dtype=np.float32)
    rc = lib.gs_load_depth_batch(
        _paths_array(paths),
        len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height,
        width,
        1.0 / depth_scale,
    )
    if rc:
        raise IOError(f"native loader failed on {paths[rc - 1]}")
    return out[..., None]
