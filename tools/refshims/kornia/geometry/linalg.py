"""Faithful reimplementations of the two kornia.geometry.linalg functions
the reference uses (same math as kornia 0.x):

- ``compose_transformations(trans_01, trans_12) -> trans_02``:
  R_02 = R_01 @ R_12, t_02 = R_01 @ t_12 + t_01, bottom row [0,0,0,1].
- ``inverse_transformation(trans) -> trans_inv``:
  R^T, -R^T t, bottom row [0,0,0,1].

Both accept (4, 4) or (B, 4, 4).
"""
import torch


def _check(t, name):
    if not torch.is_tensor(t):
        raise TypeError(f"{name} must be a torch.Tensor")
    if t.shape[-2:] != (4, 4) or t.dim() not in (2, 3):
        raise ValueError(f"{name} must be (4,4) or (B,4,4), got {tuple(t.shape)}")


def compose_transformations(trans_01: torch.Tensor, trans_12: torch.Tensor):
    _check(trans_01, "trans_01")
    _check(trans_12, "trans_12")
    r01 = trans_01[..., :3, :3]
    t01 = trans_01[..., :3, 3:]
    r12 = trans_12[..., :3, :3]
    t12 = trans_12[..., :3, 3:]
    r02 = r01 @ r12
    t02 = r01 @ t12 + t01
    out = torch.zeros_like(trans_01)
    out[..., :3, :3] = r02
    out[..., :3, 3:] = t02
    out[..., 3, 3] = 1.0
    return out


def inverse_transformation(trans: torch.Tensor):
    _check(trans, "trans")
    r = trans[..., :3, :3]
    t = trans[..., :3, 3:]
    rt = r.transpose(-2, -1)
    out = torch.zeros_like(trans)
    out[..., :3, :3] = rt
    out[..., :3, 3:] = -(rt @ t)
    out[..., 3, 3] = 1.0
    return out
