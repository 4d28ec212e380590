"""Microbench: 12-channel row scatter/gather cost vs index order at
ScanNet arena scale (1.2M rows) on the attached TPU.

Hypothesis (from the round-4 ScanNet trace): random-index row ops on a
118 MB planar arena run ~5x over the small-table floor because of cache
misses, so SORTED indices should recover the floor — which would let the
windowed writeback collapse to one direct sorted scatter.

Chained-dispatch timing per CLAUDE.md microbench rules (feed outputs
forward inside one jit; one scalar fetch at the end).
"""

import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

B, CAP, HW, C = 2, 1_228_800, 76_800, 12
REPS = 20


def main():
    global CAP
    if len(sys.argv) > 1:
        CAP = int(sys.argv[1])
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(B, CAP, C)).astype(np.float32))
    rows = jnp.asarray(rng.normal(size=(B, HW, C)).astype(np.float32))
    idx_rand = jnp.asarray(
        np.stack([
            rng.choice(CAP, size=HW, replace=False) for _ in range(B)
        ]).astype(np.int32)
    )
    idx_sort = jnp.sort(idx_rand, axis=1)
    bw = jnp.broadcast_to(jnp.arange(B)[:, None], (B, HW))

    def scatter_loop(d, idx, r):
        def body(i, dd):
            return dd.at[bw, idx].set(r + i * 1e-9)
        return jax.lax.fori_loop(0, REPS, body, d).sum()

    def gather_loop(d, idx, r):
        # The index must be GENUINELY iteration-dependent: an earlier
        # `idx + i * 0` folded to `idx` under XLA's algebraic simplifier,
        # letting while-loop LICM hoist the gather so the loop measured
        # ~1 gather instead of REPS (advisor finding, round 4).
        # (idx + i) % CAP keeps the same distribution (random stays
        # random; sorted stays sorted up to one wrap point).
        def body(i, acc):
            sh = jnp.remainder(idx + i, CAP)
            g = jnp.take_along_axis(d, sh[..., None], axis=1)
            return acc + g.sum()
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    for name, fn in (("scatter", scatter_loop), ("gather", gather_loop)):
        for order, idx in (("rand", idx_rand), ("sorted", idx_sort)):
            f = jax.jit(fn)
            float(f(data, idx, rows))  # compile + remote warm
            float(f(data, idx, rows))
            t0 = time.perf_counter()
            float(f(data, idx, rows))
            dt = (time.perf_counter() - t0) / REPS
            print(
                f"{name:8s} {order:6s}: {dt*1e3:7.3f} ms/op  "
                f"({dt/ (B*HW) * 1e9:5.1f} ns/row)"
            )


if __name__ == "__main__":
    main()
