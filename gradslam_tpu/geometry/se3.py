"""Lie group ops for SO(3)/SE(3) (TPU-native, batched, differentiable).

Parity surface with the reference's se3utils
(reference: gradslam/geometry/se3utils.py) but batched from the start:
every function accepts arbitrary leading batch dims, and the small-angle
branch is expressed with ``jnp.where`` (safe for jit and reverse-mode AD)
instead of Python control flow.

Small-angle behavior intentionally matches the reference
(gradslam/geometry/se3utils.py:89-91): for ``||omega|| < 1e-6`` both the
rotation and the V matrix are approximated by ``I + hat(omega)`` (the
reference uses this first-order form rather than the exact series; we keep
it for numerical parity).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-6

__all__ = ["so3_hat", "se3_hat", "so3_exp", "se3_exp", "se3_log"]


def rt_matrix(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Packs (..., 3, 3) rotations + (..., 3) translations into
    (..., 4, 4) homogeneous transforms.

    Assembly is two concatenations instead of zeros + three
    dynamic-update-slices: identical values, but the solver loops launch
    this on tiny (B, 4, 4) arrays hundreds of times per frame and each
    DUS costs ~0.9 us of launch overhead against ~0.12 us for a concat
    (v5e trace, round 5).
    """
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype),
        top.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def so3_hat(omega: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric (hat) matrix of (..., 3) axis-angle vectors.

    Reference parity: gradslam/geometry/se3utils.py:11.
    """
    if omega.shape[-1] != 3:
        raise ValueError(f"omega must be (..., 3), got {omega.shape}")
    ox, oy, oz = omega[..., 0], omega[..., 1], omega[..., 2]
    zero = jnp.zeros_like(ox)
    hat = jnp.stack(
        [zero, -oz, oy, oz, zero, -ox, -oy, ox, zero],
        axis=-1,
    )
    return hat.reshape(omega.shape[:-1] + (3, 3))


def se3_hat(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) hat operator for (..., 6) twists ``[v, omega]``.

    Reference parity: gradslam/geometry/se3utils.py:29.
    """
    if xi.shape[-1] != 6:
        raise ValueError(f"xi must be (..., 6), got {xi.shape}")
    v = xi[..., :3]
    omega = xi[..., 3:]
    out = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    out = out.at[..., :3, :3].set(so3_hat(omega))
    out = out.at[..., :3, 3].set(v)
    return out


def _rodrigues_terms(omega: jnp.ndarray):
    """Shared Rodrigues coefficients with small-angle-safe gradients.

    Returns (omega_hat, omega_hat_sq, A, B, C, is_small) where for
    ``is_small`` the caller should fall back to the first-order form.
    ``theta`` is guarded so reverse-mode AD never divides by zero.
    """
    omega_hat = so3_hat(omega)
    omega_hat_sq = jnp.matmul(omega_hat, omega_hat)
    theta_sq = jnp.sum(omega * omega, axis=-1)
    is_small = theta_sq < _EPS * _EPS
    # Guard: use theta=1 in the small branch; result discarded by `where`.
    theta = jnp.sqrt(jnp.where(is_small, jnp.ones_like(theta_sq), theta_sq))
    s, c = jnp.sin(theta), jnp.cos(theta)
    A = s / theta
    B = (1.0 - c) / (theta * theta)
    C = (theta - s) / (theta * theta * theta)
    return omega_hat, omega_hat_sq, A, B, C, is_small


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Exponential map of (..., 3) axis-angle vectors to (..., 3, 3) rotations.

    Rodrigues' formula ``R = I + A*hat + B*hat^2``; for small angles
    ``R = I + hat`` exactly as the reference (se3utils.py:57-58).
    """
    omega_hat, omega_hat_sq, A, B, _, is_small = _rodrigues_terms(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), omega_hat.shape)
    A_ = jnp.where(is_small, jnp.ones_like(A), A)[..., None, None]
    B_ = jnp.where(is_small, jnp.zeros_like(B), B)[..., None, None]
    return eye + A_ * omega_hat + B_ * omega_hat_sq


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map of (..., 6) twists ``[v, omega]`` to (..., 4, 4) transforms.

    ``R = I + A*hat + B*hat^2``, ``V = I + B*hat + C*hat^2``, ``t = V v``;
    small-angle branch sets both ``R`` and ``V`` to ``I + hat`` for parity
    with the reference (se3utils.py:89-91).
    """
    if xi.shape[-1] != 6:
        raise ValueError(f"xi must be (..., 6), got {xi.shape}")
    v = xi[..., :3]
    omega = xi[..., 3:]
    omega_hat, omega_hat_sq, A, B, C, is_small = _rodrigues_terms(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), omega_hat.shape)

    A_ = jnp.where(is_small, jnp.ones_like(A), A)[..., None, None]
    B_r = jnp.where(is_small, jnp.zeros_like(B), B)[..., None, None]
    R = eye + A_ * omega_hat + B_r * omega_hat_sq

    B_v = jnp.where(is_small, jnp.ones_like(B), B)[..., None, None]
    C_v = jnp.where(is_small, jnp.zeros_like(C), C)[..., None, None]
    V = eye + B_v * omega_hat + C_v * omega_hat_sq

    t = jnp.einsum("...ij,...j->...i", V, v)
    return rt_matrix(R, t)


def se3_log(transform: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Logarithm map of (..., 4, 4) rigid transforms to (..., 6) twists.

    Net-new utility (no reference equivalent) used by trajectory metrics and
    pose-graph refinement. Inverse of :func:`se3_exp` away from theta = pi.
    """
    if transform.shape[-2:] != (4, 4):
        raise ValueError(f"transform must be (..., 4, 4), got {transform.shape}")
    R = transform[..., :3, :3]
    t = transform[..., :3, 3]
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps)
    theta = jnp.arccos(cos_theta)
    is_small = theta < _EPS
    theta_safe = jnp.where(is_small, jnp.ones_like(theta), theta)

    # omega_hat = theta / (2 sin theta) * (R - R^T)
    coeff = jnp.where(
        is_small,
        jnp.full_like(theta, 0.5),
        theta_safe / (2.0 * jnp.sin(theta_safe)),
    )[..., None, None]
    w_hat = coeff * (R - jnp.swapaxes(R, -1, -2))
    omega = jnp.stack(
        [w_hat[..., 2, 1], w_hat[..., 0, 2], w_hat[..., 1, 0]], axis=-1
    )

    # V^-1 = I - hat/2 + (1/theta^2)(1 - A/(2B)) hat^2
    omega_hat = so3_hat(omega)
    omega_hat_sq = jnp.matmul(omega_hat, omega_hat)
    A = jnp.sin(theta_safe) / theta_safe
    B = (1.0 - jnp.cos(theta_safe)) / (theta_safe * theta_safe)
    coef2 = jnp.where(
        is_small,
        jnp.full_like(theta, 1.0 / 12.0),
        (1.0 - A / (2.0 * B)) / (theta_safe * theta_safe),
    )[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=transform.dtype), R.shape)
    Vinv = eye - 0.5 * omega_hat + coef2 * omega_hat_sq
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([v, omega], axis=-1)
