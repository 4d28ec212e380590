from . import datautils, tumutils
from .dataloader import DataLoader, default_collate
from .tum import TUM
from .icl import ICL
from .scannet import Scannet, get_color_encoding, nyu40_to_scannet20

__all__ = [
    "TUM",
    "ICL",
    "Scannet",
    "DataLoader",
    "default_collate",
    "datautils",
    "tumutils",
    "nyu40_to_scannet20",
    "get_color_encoding",
]
