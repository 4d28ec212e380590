from .checkpoint import load_slam_state, save_slam_state
from .profiling import DeviceTimer, annotate, sync, trace

__all__ = [
    "save_slam_state",
    "load_slam_state",
    "DeviceTimer",
    "annotate",
    "sync",
    "trace",
]
