"""Structure helper utilities.

Parity surface with the reference's structutils
(reference: gradslam/structures/structutils.py): list<->padded conversion
helpers (host boundary; on device the padded+mask form is canonical) and
plotly image helpers (re-exported from gradslam_tpu.viz).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

__all__ = ["list_to_padded", "padded_to_list"]


def list_to_padded(
    x: Sequence,
    pad_size: Optional[Sequence[int]] = None,
    pad_value: float = 0.0,
    equisized: bool = False,
) -> jnp.ndarray:
    """Stacks a list of B (N_b, C) arrays into (B, maxN, C) with padding.

    Reference parity: structutils.py:47 (pytorch3d-derived helper).

    Args:
        x: list of 2D arrays (variable first dim).
        pad_size: optional output (N, C); defaults to per-dim maxima.
        pad_value: fill value for padding.
        equisized: if True, all inputs are the same shape — plain stack.
    """
    if equisized:
        return jnp.stack([jnp.asarray(t) for t in x])
    arrays = [np.asarray(t) for t in x]
    for a in arrays:
        if a.ndim != 2:
            raise ValueError("all items must be 2-dimensional")
    if pad_size is None:
        pad_dim0 = max((a.shape[0] for a in arrays), default=0)
        pad_dim1 = max((a.shape[1] for a in arrays), default=0)
    else:
        if len(pad_size) != 2:
            raise ValueError("pad_size must have length 2")
        pad_dim0, pad_dim1 = pad_size
        for a in arrays:
            if a.shape[0] > pad_dim0 or a.shape[1] > pad_dim1:
                raise ValueError(
                    f"pad_size {tuple(pad_size)} too small for input of "
                    f"shape {a.shape}"
                )
    out = np.full(
        (len(arrays), pad_dim0, pad_dim1),
        pad_value,
        dtype=arrays[0].dtype if arrays else np.float32,
    )
    for b, a in enumerate(arrays):
        out[b, : a.shape[0], : a.shape[1]] = a
    return jnp.asarray(out)


def padded_to_list(
    x: jnp.ndarray, split_size: Optional[Sequence[int]] = None
) -> List[jnp.ndarray]:
    """Splits a (B, N, C) padded array back into a list of (N_b, C) views.

    Reference parity: structutils.py:89.

    Args:
        x: (B, N, C) padded array.
        split_size: per-element first-dim sizes; None keeps full rows.
    """
    arr = np.asarray(x)
    if split_size is None:
        return [jnp.asarray(arr[b]) for b in range(arr.shape[0])]
    if len(split_size) != arr.shape[0]:
        raise ValueError(
            f"split_size length {len(split_size)} != batch size {arr.shape[0]}"
        )
    return [
        jnp.asarray(arr[b, : split_size[b]]) for b in range(arr.shape[0])
    ]
