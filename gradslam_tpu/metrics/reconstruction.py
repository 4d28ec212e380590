"""Reconstruction quality metrics (chamfer distance, map accuracy).

Net-new scope (the reference ships an empty metrics package — SURVEY.md
§5). Uses the same Pallas/jnp 1-NN core as odometry.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..ops.knn import knn

__all__ = ["chamfer_distance", "map_accuracy"]


def chamfer_distance(
    points_a: jnp.ndarray,
    points_b: jnp.ndarray,
    valid_a: Optional[jnp.ndarray] = None,
    valid_b: Optional[jnp.ndarray] = None,
    squared: bool = True,
) -> jnp.ndarray:
    """Symmetric chamfer distance between two batched point sets.

    ``CD = mean_a min_b |a-b|^2 + mean_b min_a |b-a|^2`` (the classic
    reconstruction-vs-ground-truth metric; set ``squared=False`` for
    root distances).

    Args:
        points_a / points_b: (B, N, 3) / (B, M, 3).
        valid_a / valid_b: optional (B, N) / (B, M) masks.

    Returns:
        (B,) chamfer distances.
    """
    d_ab, _ = knn(points_a, points_b, valid_b)
    d_ba, _ = knn(points_b, points_a, valid_a)
    if not squared:
        d_ab = jnp.sqrt(jnp.maximum(d_ab, 0))
        d_ba = jnp.sqrt(jnp.maximum(d_ba, 0))

    def masked_mean(d, valid):
        if valid is None:
            return jnp.mean(d, axis=1)
        w = valid.astype(d.dtype)
        return jnp.sum(d * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1)

    return masked_mean(d_ab, valid_a) + masked_mean(d_ba, valid_b)


def map_accuracy(
    map_points: jnp.ndarray,
    gt_points: jnp.ndarray,
    map_valid: Optional[jnp.ndarray] = None,
    gt_valid: Optional[jnp.ndarray] = None,
    threshold: float = 0.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Accuracy / completeness of a reconstructed map vs ground truth.

    Accuracy: fraction of map points within ``threshold`` of ground truth.
    Completeness: fraction of ground-truth points within ``threshold`` of
    the map.

    Returns:
        (accuracy (B,), completeness (B,)).
    """
    d_mg, _ = knn(map_points, gt_points, gt_valid)
    d_gm, _ = knn(gt_points, map_points, map_valid)
    th_sq = threshold * threshold

    def masked_frac(d, valid):
        hit = (d < th_sq).astype(jnp.float32)
        if valid is None:
            return jnp.mean(hit, axis=1)
        w = valid.astype(jnp.float32)
        return jnp.sum(hit * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1)

    return masked_frac(d_mg, map_valid), masked_frac(d_gm, gt_valid)
