"""CPU ``knn_points`` shim for ``chamferdist==1.0.0`` (the reference's one
native/CUDA component, imported at
/root/reference/gradslam/odometry/icputils.py:3 and called at :200 with
K=1 and no length masking).

Brute-force exact 1-NN: squared distances, min-index tie-break (matches the
CUDA kernel's strict-less running-min scan: among equal distances the
LOWEST target index wins — torch.min has the same first-minimum rule).
Returns the same namedtuple fields the reference reads (``.dists``,
``.idx``).
"""
from collections import namedtuple

import torch

_KNN = namedtuple("KNN", ["dists", "idx", "knn"])


def knn_points(
    p1: torch.Tensor,
    p2: torch.Tensor,
    lengths1=None,
    lengths2=None,
    K: int = 1,
    version: int = -1,
    return_nn: bool = False,
    return_sorted: bool = True,
):
    if p1.dim() != 3 or p2.dim() != 3:
        raise ValueError("p1 and p2 must be (B, N, D) tensors")
    if lengths1 is not None or lengths2 is not None:
        raise NotImplementedError("shim supports only full-length clouds")
    # (B, N1, N2) squared distances; chunk over N1 to bound memory.
    B, N1, _ = p1.shape
    dists_out = p1.new_empty((B, N1, K))
    idx_out = torch.empty((B, N1, K), dtype=torch.int64, device=p1.device)
    chunk = max(1, int(1e7) // max(1, p2.shape[1]))
    for s in range(0, N1, chunk):
        # explicit (x-y)^2 sum — same arithmetic as the CUDA kernel; a
        # matmul-based cdist would perturb near-tie distances and can flip
        # the argmin.
        d = ((p1[:, s : s + chunk, None, :] - p2[:, None, :, :]) ** 2).sum(-1)
        if K == 1:
            # torch.min's first-minimum rule == CUDA kernel tie-break;
            # topk's tie order is unspecified, so use min explicitly.
            vals, idx = d.min(dim=2, keepdim=True)
        else:
            vals, idx = torch.topk(d, K, dim=2, largest=False, sorted=True)
        dists_out[:, s : s + chunk] = vals
        idx_out[:, s : s + chunk] = idx
    nn = None
    if return_nn:
        nn = torch.gather(
            p2[:, :, None].expand(-1, -1, K, -1),
            1,
            idx_out[..., None].expand(-1, -1, -1, p2.shape[-1]),
        )
    return _KNN(dists=dists_out, idx=idx_out, knn=nn)
