"""TUM RGB-D benchmark file helpers.

Reimplements the association tooling the TUM benchmark ships (and the
reference vendors at gradslam/datasets/tumutils.py): timestamped file
lists and greedy nearest-timestamp association.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

__all__ = ["read_file_list", "associate"]


def read_file_list(filename: str) -> Dict[float, List[str]]:
    """Reads a TUM-format file of ``timestamp data...`` lines.

    Lines starting with '#' are comments. Returns {timestamp: [data...]}.
    """
    with open(filename) as f:
        text = f.read()
    out = {}
    for line in text.replace(",", " ").replace("\t", " ").split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = [p for p in line.split(" ") if p]
        if len(parts) > 1:
            out[float(parts[0])] = parts[1:]
    return out


def associate(
    first_list: Dict[float, List[str]],
    second_list: Dict[float, List[str]],
    offset: float = 0.0,
    max_difference: float = 0.02,
) -> List[Tuple[float, float]]:
    """Greedy nearest-timestamp association between two stamped lists.

    All candidate pairs within ``max_difference`` are sorted by |dt| and
    taken greedily, each timestamp used at most once — same algorithm as
    the TUM benchmark's associate.py (reference tumutils.py:182).
    """
    first_keys = set(first_list.keys())
    second_keys = set(second_list.keys())
    potential = [
        (abs(a - (b + offset)), a, b)
        for a in first_keys
        for b in second_keys
        if abs(a - (b + offset)) < max_difference
    ]
    potential.sort()
    matches = []
    for _, a, b in potential:
        if a in first_keys and b in second_keys:
            first_keys.remove(a)
            second_keys.remove(b)
            matches.append((a, b))
    matches.sort()
    return matches
