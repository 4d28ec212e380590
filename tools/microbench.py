"""Microbenchmarks for hot-op variants on the attached TPU.

Timing follows CLAUDE.md: chain calls (output feeds next input), fetch one
scalar at the end — per-iteration fetches measure host dispatch, not device
time. Usage: python tools/microbench.py [scatter|sort|compact]
"""

import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

B, CAP, HW, C = 2, 192000, 19200, 12


def chain_time(fn, *args, iters=30, perturb=None):
    """fn must return something shaped like args[0]; chains arg0."""
    f = jax.jit(fn)
    x = f(*args)
    float(jnp.sum(x))  # compile + remote warmup
    x = f(*args)
    float(jnp.sum(x))
    t0 = time.perf_counter()
    y = args[0]
    for _ in range(iters):
        y = f(y, *args[1:])
    float(jnp.sum(y))
    return (time.perf_counter() - t0) / iters


def bench_scatter():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(B, CAP, C)).astype(np.float32))
    rows = jnp.asarray(rng.normal(size=(B, HW, C)).astype(np.float32))
    slots = jnp.asarray(
        rng.choice(CAP, size=(B, HW), replace=False).astype(np.int32)
    )
    bw = jnp.broadcast_to(jnp.arange(B)[:, None], (B, HW))

    def cur(d, r, s):
        return d.at[bw, s].set(r, mode="drop")

    def flat(d, r, s):
        d2 = d.reshape(B * CAP, C)
        s2 = (s + jnp.arange(B, dtype=jnp.int32)[:, None] * CAP).reshape(-1)
        return d2.at[s2].set(r.reshape(B * HW, C), mode="drop").reshape(d.shape)

    def u64view(d, r, s):
        d2 = jax.lax.bitcast_convert_type(d, jnp.uint64).reshape(B, CAP, C // 2)
        r2 = jax.lax.bitcast_convert_type(r, jnp.uint64).reshape(B, HW, C // 2)
        out = d2.at[bw, s].set(r2, mode="drop")
        return jax.lax.bitcast_convert_type(
            out.reshape(B, CAP, C // 2, 1), jnp.float32
        ).reshape(d.shape)

    for name, fn in [("current", cur), ("flat", flat), ("u64", u64view)]:
        try:
            dt = chain_time(fn, data, rows, slots)
            print(f"scatter/{name}: {dt*1e3:.3f} ms  ({dt/ (B*HW) *1e9:.1f} ns/row)")
        except Exception as e:
            print(f"scatter/{name}: FAILED {type(e).__name__}: {e}")


def bench_sort():
    rng = np.random.default_rng(0)
    A = 38400
    p = jnp.asarray(rng.integers(0, HW + 1, size=(B, A)).astype(np.int32))
    c = jnp.asarray(rng.normal(size=(B, A)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(B, A)).astype(np.float32))
    s = jnp.asarray(rng.permutation(np.tile(np.arange(A), B)).reshape(B, A).astype(np.int32))

    def stable(p_, c_, r_, s_):
        o = jax.vmap(lambda a, b, cc, d: jax.lax.sort((a, b, cc, d), num_keys=4))(p_, c_, r_, s_)
        return o[0]

    def unstable(p_, c_, r_, s_):
        o = jax.vmap(
            lambda a, b, cc, d: jax.lax.sort(
                (a, b, cc, d), num_keys=4, is_stable=False
            )
        )(p_, c_, r_, s_)
        return o[0]

    for name, fn in [("stable", stable), ("unstable", unstable)]:
        dt = chain_time(fn, p, c, r, s)
        print(f"sort4/{name}: {dt*1e3:.3f} ms")


def bench_compact():
    from gradslam_tpu.ops import masking

    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random((B, CAP)) < 0.17)

    for block in [512, 1024, 2048, 4096, 8192]:
        def fn(m):
            idx, valid = masking._compact_masked_sorted(m, 38400, block=block)
            # feed a same-shaped bool back for chaining
            return m ^ (jnp.zeros_like(m).at[:, :1].set(valid[:, :1] & (idx[:, :1] >= 0)))
        dt = chain_time(fn, mask)
        print(f"compact/block={block}: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("scatter", "all"):
        bench_scatter()
    if which in ("sort", "all"):
        bench_sort()
    if which in ("compact", "all"):
        bench_compact()
