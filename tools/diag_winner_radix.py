"""Measures radix-bucket winner selection against the 4-key sort.

The round-4 verdict named "a Pallas radix bucketing kernel (bucket
winners by pixel key, resolve max-ccount/min-raydist/min-index
in-bucket)" as the candidate escape from the winner-sort cost at the
ScanNet operating point. This tool measures the primitives any such
kernel must be built from, at the real shapes (A = 2*H*W candidates,
HW = 76800 pixel buckets, B = 2), against the shipped 4-key-sort
selection:

  A. sort4: the shipped selection — one 4-key s32 lax.sort + first-mask
     + one winner scatter producing the per-pixel model image.
  B. scatter-rounds: the pure-XLA bucket formulation — lexicographic
     winner via 3 chained scatter-min passes with 2 gather-backs
     (each round: per-pixel scatter-reduce, then every candidate reads
     its pixel's running best to learn if it survived).
  C. pallas-rmw: the in-kernel bucket formulation — a Pallas kernel
     holding the per-pixel best table in VMEM (614 KB — fits) and
     folding candidates in with per-candidate read-modify-write. TPU
     has no vectorized scatter: each RMW is a scalar dynamic
     load+compare+store chain, so this measures the per-candidate
     serial rate (ONE pass of the 2-3 a lexicographic resolve needs).

Correctness of B and C is checked against A before timing (same winner
per pixel on random data). Chained-dispatch timing per CLAUDE.md
microbench rules.

MEASURED VERDICT (one v5e, round 5 — see docs/PERFORMANCE.md):
  sort4           6.0 ms/selection (19.6 ns/candidate)
  scatter-rounds 10.0 ms/selection (32.6 ns/candidate) — 1.6x SLOWER
                 while resolving only ONE priority word of the real
                 2-word lexicographic key
  pallas-rmw     INEXPRESSIBLE: three escalating formulations, three
                 Mosaic rejections — (1, A) blocks violate sublane
                 divisibility; scalar stores to VMEM are rejected
                 outright ("Cannot store scalars to VMEM"); 1-element
                 dynamic-slice RMW fails lowering ("cannot statically
                 prove that index in dimension 1 is a multiple of 128").
                 TPU VMEM writes are tile-granular at 128-lane-aligned
                 static offsets; data-dependent per-candidate placement
                 — the core primitive of ANY radix bucketing kernel —
                 has no hardware path.
"""

import functools
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

B, A, HW = 2, 153_600, 76_800
REPS = 10


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    # candidate rows: random pixel, random priority key (s32 monotone
    # image of -ccount — one word of the real 3-word key), slot = row
    pix = jnp.asarray(rng.integers(0, HW, size=(B, A)).astype(np.int32))
    key = jnp.asarray(
        rng.integers(0, 2**20, size=(B, A)).astype(np.int32)
    )
    slot = jnp.broadcast_to(jnp.arange(A, dtype=jnp.int32)[None], (B, A))
    bw = jnp.broadcast_to(jnp.arange(B)[:, None], (B, A))

    # ---- A: the shipped 4-key sort selection -------------------------
    def sort4(p, k, s):
        ps, ks, ss = jax.vmap(
            lambda a, b, c: jax.lax.sort((a, b, c), num_keys=3,
                                         is_stable=False)
        )(p, k, s)
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), ps[:, 1:] != ps[:, :-1]], axis=1
        )
        win = first
        return (
            jnp.full((B, HW + 1), A, jnp.int32)
            .at[bw, jnp.where(win, ps, HW)]
            .set(ss, mode="drop")
        )[:, :HW]

    # ---- B: chained scatter-min rounds (XLA bucket formulation) ------
    def scatter_rounds(p, k, s):
        m1 = (
            jnp.full((B, HW + 1), 2**31 - 1, jnp.int32)
            .at[bw, p]
            .min(k, mode="drop")
        )
        c1 = k == jnp.take_along_axis(m1, p, axis=1)  # gather-back 1
        m2 = (
            jnp.full((B, HW + 1), A, jnp.int32)
            .at[bw, jnp.where(c1, p, HW)]
            .min(s, mode="drop")
        )
        return m2[:, :HW]

    # ---- C: Pallas per-candidate RMW into a VMEM best table ----------
    # Full-array blocks (Mosaic rejects a (1, A) block: the sublane dim
    # of a block must be divisible by 8 or equal the array dim); the
    # static B=2 loop is unrolled inside one kernel instance.
    def _rmw_kernel(pix_ref, key_ref, slot_ref, best_ref, bslot_ref, *, n):
        best_ref[...] = jnp.full_like(best_ref, 2**31 - 1)
        bslot_ref[...] = jnp.full_like(bslot_ref, A)

        def body(i, _):
            for b in range(B):
                # Mosaic rejects scalar stores to VMEM outright
                # ("Cannot store scalars to VMEM"); the closest legal
                # form is a 1-element dynamic-slice store, which the
                # hardware implements as a read-modify-write of the
                # surrounding tile
                p = pix_ref[b, i]
                kk = key_ref[b, i]
                cur = best_ref[b, pl.ds(p, 1)]
                better = kk < cur
                best_ref[b, pl.ds(p, 1)] = jnp.where(better, kk, cur)
                sl = jnp.broadcast_to(slot_ref[b, i], (1,))
                bslot_ref[b, pl.ds(p, 1)] = jnp.where(
                    better, sl, bslot_ref[b, pl.ds(p, 1)]
                )
            return 0

        jax.lax.fori_loop(0, n, body, 0)

    @jax.jit
    def pallas_rmw(p, k, s):
        kern = functools.partial(_rmw_kernel, n=A)
        best, bslot = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((B, HW), jnp.int32),
                jax.ShapeDtypeStruct((B, HW), jnp.int32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
        )(p, k, s)
        return bslot

    # correctness first: every method must pick the same winner.
    # sort4's winner is min (key, slot) lexicographic per pixel; the
    # random keys are almost surely distinct per pixel, and both B and C
    # break exact key ties differently — compare on the key VALUE
    ref = np.asarray(sort4(pix, key, slot))
    for name, fn in (("scatter-rounds", scatter_rounds),
                     ("pallas-rmw", pallas_rmw)):
        try:
            got = np.asarray(fn(pix, key, slot))
        except Exception as e:
            print(f"{name}: FAILED to build/run: {type(e).__name__}: {e}")
            continue
        kr = np.asarray(key)
        ok = True
        for b in range(B):
            kv_ref = np.where(ref[b] < A, kr[b][np.minimum(ref[b], A - 1)],
                              -1)
            kv_got = np.where(got[b] < A, kr[b][np.minimum(got[b], A - 1)],
                              -1)
            ok &= bool((kv_ref == kv_got).all())
        print(f"{name}: winner keys match sort4: {ok}")

    # timing: chained dispatch (output perturbs next input's key so no
    # op is loop-invariant), one fetch at the end
    for name, fn in (("sort4", sort4), ("scatter-rounds", scatter_rounds),
                     ("pallas-rmw", pallas_rmw)):
        try:
            @jax.jit
            def loop(p, k, s, fn=fn):
                def body(i, kk):
                    out = fn(p, kk, s)
                    # fold the result back into the keys (zero net change
                    # is NOT used — a genuine data dependence)
                    return kk ^ (out[:, :1] & 1)
                return jax.lax.fori_loop(0, REPS, body, k).sum()

            float(loop(pix, key, slot))
            float(loop(pix, key, slot))
            t0 = time.perf_counter()
            float(loop(pix, key, slot))
            dt = (time.perf_counter() - t0) / REPS
            print(f"{name:15s}: {dt*1e3:8.3f} ms/selection "
                  f"({dt / (B * A) * 1e9:5.1f} ns/candidate)")
        except Exception as e:
            print(f"{name}: timing failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
