"""Scaling-efficiency benchmark: sequence-parallel SLAM over a device mesh.

Measures wall-clock for the same L-frame workload processed with 1 vs N
parallel chunks (sequence parallelism; chunks shard over the mesh 'data'
axis) and reports scaling efficiency = T1 / (N * TN).

On this machine only one TPU chip is attached, so by default this runs on
a virtual multi-device CPU mesh (JAX's fake backend,
--xla_force_host_platform_device_count) — validating the sharded program
end-to-end; on a real pod slice the same harness measures true scaling.

Usage:
    python bench_scaling.py [--devices 8] [--frames 33] [--real]
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=4)
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument(
        "--real",
        action="store_true",
        help="use the attached backend instead of a virtual CPU mesh",
    )
    args = ap.parse_args()

    if not args.real:
        from gradslam_tpu.utils.devices import force_virtual_cpu_devices

        force_virtual_cpu_devices(args.devices)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gradslam_tpu.parallel import make_mesh
    from gradslam_tpu.parallel.seqpar import sequence_parallel_slam
    from gradslam_tpu.slam.icpslam import SLAMOptions

    n_dev = len(jax.devices())
    L = args.frames

    # golden clip cycled to L frames (B=1)
    import pathlib

    d = pathlib.Path(__file__).parent / "tests" / "data" / "msrd_b2s3"
    colors_raw = np.load(d / "colors.npy")[:1]
    depths_raw = np.load(d / "depths.npy")[:1]
    idx = [i % colors_raw.shape[1] for i in range(L)]
    colors = jnp.asarray(colors_raw[:, idx])
    depths = jnp.asarray(depths_raw[:, idx])
    K = jnp.asarray(np.load(d / "intrinsics.npy")[:1])

    opts = SLAMOptions(odom="gradicp", numiters=10, dsratio=4, fusion=True)

    def timed(n_chunks, mesh=None, reps=3):
        def run():
            res = sequence_parallel_slam(
                colors, depths, K, opts, n_chunks=n_chunks, mesh=mesh
            )
            return float(res.poses.sum())

        run()  # compile
        run()  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            run()
        return (time.perf_counter() - t0) / reps

    t1 = timed(1)
    mesh = make_mesh(data=n_dev, map_=1)
    tn = timed(n_dev, mesh=mesh)
    eff = t1 / (n_dev * tn)
    print(
        json.dumps(
            {
                "metric": "seqpar_scaling_efficiency",
                "devices": n_dev,
                "backend": jax.default_backend(),
                "t1_sec": round(t1, 4),
                "tn_sec": round(tn, 4),
                "speedup": round(t1 / tn, 3),
                "value": round(eff, 4),
                "unit": "fraction",
            }
        )
    )


if __name__ == "__main__":
    main()
