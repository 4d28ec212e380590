"""Real-format end-to-end integration: files on disk to ATE.

The reference was exercised against real TUM/ScanNet directory trees
(reference tests/datasets/test_tum.py:14-17 — skipped in CI, run locally
upstream). No real datasets exist on this box (zero egress), so these
tests RENDER a geometrically coherent RGB-D sequence (textured bumpy
surface, known camera trajectory, exact ray-cast depth), write it to
disk in the exact TUM and ScanNet on-disk formats (8-bit color, 16-bit
depth PNGs at the dataset depth scales, metadata/pose files), and then
run the FULL production chain:

    loader (C++ native decode) -> DataLoader(num_workers, prefetch,
    to_device) -> slam_sequence_managed -> close_loops_rgbd -> ate_rmse

checking that gradICP actually tracks the rendered motion (ATE in the
millimeter range) — not just that shapes line up. A separate test
measures IO-included throughput and proves decode/compute overlap.
"""

import time

import imageio.v2 as imageio
import numpy as np
import pytest

H, W = 48, 64
N_FRAMES = 12
# the TUM loader hardcodes fx=fy=525, cx=319.5, cy=239.5 at 640x480 and
# scales by (W/640, H/480); rendering with the pre-scaled values makes
# the on-disk intrinsics exact at load time (no resize)
FX = FY = 525.0 * W / 640.0
CX, CY = 319.5 * W / 640.0, 239.5 * H / 480.0


def _surface_z(x, y):
    """World surface height field (smooth, textured, slopes < 1)."""
    return (
        3.0
        + 0.25 * np.sin(1.7 * x + 0.5) * np.cos(1.9 * y)
        + 0.15 * np.sin(0.9 * y + 1.0)
    )


def _texture(x, y):
    """RGB texture sampled at world (x, y), in [0, 1]."""
    return np.stack(
        [
            0.5 + 0.45 * np.sin(3.0 * x),
            0.5 + 0.45 * np.cos(2.0 * y + 1.0),
            0.5 + 0.45 * np.sin(1.3 * (x + y)),
        ],
        axis=-1,
    )


def render_sequence():
    """Ray-casts N_FRAMES RGB-D frames of the surface from a translating
    camera. Returns (colors u8 (N,H,W,3), depth m (N,H,W), poses
    (N,4,4))."""
    u = np.arange(W, dtype=np.float64)
    v = np.arange(H, dtype=np.float64)
    dx = (u[None, :] - CX) / FX  # (1, W)
    dy = (v[:, None] - CY) / FY  # (H, 1)
    dx = np.broadcast_to(dx, (H, W))
    dy = np.broadcast_to(dy, (H, W))

    colors, depths, poses = [], [], []
    for k in range(N_FRAMES):
        t = np.array([0.03 * k, 0.015 * k, 0.01 * k])
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = t
        poses.append(T)
        # fixed-point ray-cast: s = z(o_x + s dx, o_y + s dy) - o_z
        s = np.full((H, W), 3.0)
        for _ in range(30):
            s = _surface_z(t[0] + s * dx, t[1] + s * dy) - t[2]
        x_w = t[0] + s * dx
        y_w = t[1] + s * dy
        depths.append(s)
        colors.append((_texture(x_w, y_w) * 255).astype(np.uint8))
    return np.stack(colors), np.stack(depths), np.stack(poses)


@pytest.fixture(scope="module")
def rendered():
    return render_sequence()


@pytest.fixture(scope="module")
def tum_tree(tmp_path_factory, rendered):
    """Writes the rendered sequence as a real TUM directory tree.

    PNGs are written above the render resolution and loaded back down,
    as with real TUM frames (640x480 decoded and resized to the working
    size): color at 8x with +-1 LSB noise (defeats PNG run-length
    compression, so the decode cost is realistic — the IO-overlap test
    needs a non-trivial decode; bilinear downsampling averages the noise
    back out and color never enters the solvers), depth at 4x in clean
    constant blocks (nearest downsample reproduces the rendered depth
    exactly).
    """
    colors, depths, poses = rendered
    rng = np.random.RandomState(7)
    root = tmp_path_factory.mktemp("tum_e2e")
    seq = root / "rgbd_dataset_freiburg1_render"
    (seq / "rgb").mkdir(parents=True)
    (seq / "depth").mkdir()
    up4 = np.ones((4, 4), np.uint16)
    up8 = np.ones((8, 8), np.uint8)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(N_FRAMES):
        t = 100.0 + i * 0.033
        c8 = np.stack(
            [np.kron(colors[i][..., ch], up8) for ch in range(3)], -1
        ).astype(np.int16)
        c8 += rng.randint(-1, 2, c8.shape).astype(np.int16)
        imageio.imwrite(
            str(seq / "rgb" / f"{t:.6f}.png"),
            np.clip(c8, 0, 255).astype(np.uint8),
        )
        d16 = np.round(depths[i] * 5000.0).astype(np.uint16)
        imageio.imwrite(
            str(seq / "depth" / f"{t:.6f}.png"), np.kron(d16, up4)
        )
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t:.6f} depth/{t:.6f}.png")
        tx, ty, tz = poses[i][:3, 3]
        gt_lines.append(f"{t:.6f} {tx:.6f} {ty:.6f} {tz:.6f} 0 0 0 1")
    (seq / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines))
    (seq / "depth.txt").write_text("# depth\n" + "\n".join(depth_lines))
    (seq / "groundtruth.txt").write_text("# gt\n" + "\n".join(gt_lines))
    return root


@pytest.fixture(scope="module")
def scannet_tree(tmp_path_factory, rendered):
    """Writes the rendered sequence as a real ScanNet extraction tree
    (metadata txt + per-frame color/depth/pose/label/intrinsics files)."""
    colors, depths, poses = rendered
    root = tmp_path_factory.mktemp("scannet_e2e")
    scans = root / "scans"
    meta = root / "meta"
    meta.mkdir()
    scene = scans / "scene0042_00"
    for sub in ("color", "depth", "pose", "label-filt", "intrinsic"):
        (scene / sub).mkdir(parents=True)
    # the loader scales the on-file intrinsics by (W/640, H/480): write
    # the raw-resolution values so they land on the render intrinsics
    np.savetxt(
        scene / "intrinsic" / "intrinsic_depth.txt",
        np.array(
            [
                [525.0, 0, 319.5, 0],
                [0, 525.0, 239.5, 0],
                [0, 0, 1, 0],
                [0, 0, 0, 1],
            ]
        ),
    )
    lines = []
    for i in range(N_FRAMES):
        imageio.imwrite(str(scene / "color" / f"{i}.jpg"), colors[i])
        d16 = np.round(depths[i] * 1000.0).astype(np.uint16)
        imageio.imwrite(str(scene / "depth" / f"{i}.png"), d16)
        imageio.imwrite(
            str(scene / "label-filt" / f"{i}.png"),
            np.full((H, W), 1, np.uint16),
        )
        np.savetxt(scene / "pose" / f"{i}.txt", poses[i])
        lines.append(
            f"color scene0042_00/color/{i}.jpg "
            f"depth scene0042_00/depth/{i}.png "
            f"pose scene0042_00/pose/{i}.txt "
            f"label-filt scene0042_00/label-filt/{i}.png "
            "x a x b x c "
            f"intrinsic_depth scene0042_00/intrinsic/intrinsic_depth.txt"
        )
    (meta / "scene0042_00-seq_0.txt").write_text("\n".join(lines))
    return root


def _run_chain(loader_batches, gt_poses_np):
    """DataLoader batches -> managed SLAM -> loop closure -> ATE."""
    import jax.numpy as jnp

    from gradslam_tpu.metrics import ate_rmse
    from gradslam_tpu.slam import SLAMOptions, slam_sequence_managed
    from gradslam_tpu.slam.loopclosure import close_loops_rgbd

    opts = SLAMOptions(
        odom="gradicp", numiters=12, dsratio=2, fusion=True
    )
    ates = []
    for colors, depths, K in loader_batches:
        B, L = colors.shape[:2]
        cap = L * H * W
        m, poses = slam_sequence_managed(
            colors, depths, K, None, opts, cap, segment_len=4
        )
        poses = close_loops_rgbd(
            colors, depths, K, poses,
            dsratio=2, min_separation=3, max_candidates=2,
        )
        ates.append(np.asarray(ate_rmse(poses, jnp.asarray(gt_poses_np))))
    return np.concatenate([np.atleast_1d(a) for a in ates])


class TestTUMEndToEnd:
    def test_files_to_ate(self, tum_tree):
        """TUM tree on disk -> native decode -> DataLoader -> managed
        SLAM -> loop closure -> millimeter ATE on the rendered motion."""
        import jax.numpy as jnp

        from gradslam_tpu.datasets import TUM, DataLoader
        from gradslam_tpu.datasets import native_loader

        assert native_loader.native_available(), (
            "native C++ loader must be built for the e2e test "
            "(cd native && make)"
        )
        ds = TUM(
            str(tum_tree), seqlen=6, height=H, width=W, use_native=True
        )
        assert len(ds) == 2
        loader = DataLoader(
            ds, batch_size=2, num_workers=2, prefetch=2, to_device=True
        )
        batches = []
        gt = None
        for colors, depths, K, poses, transforms, names, stamps in loader:
            batches.append((colors, depths, K))
            gt = np.asarray(poses)
        assert gt is not None and gt.shape == (2, 6, 4, 4)
        ates = _run_chain(batches, gt)
        assert ates.shape == (2,)
        assert ates.max() < 5e-3, f"ATE too large: {ates}"

    def test_depth_roundtrip_exact(self, tum_tree, rendered):
        """The on-disk 16-bit depth decodes back to the rendered depth
        to within the 1/5000 m quantization step."""
        from gradslam_tpu.datasets import TUM

        _, depths, _ = rendered
        ds = TUM(str(tum_tree), seqlen=N_FRAMES, height=H, width=W)
        got = ds[0][1][..., 0]
        np.testing.assert_allclose(got, depths, atol=1.01 / 5000.0)

    # NOTE: the ScanNet chain lives in the SAME class as the TUM chain
    # on purpose: xdist loadscope schedules per class, and both chains
    # compile identical-shape managed+closure programs — co-location
    # lets the second chain reuse the first's in-process jit cache
    # (halves the cold compile bill for this module).
    def test_scannet_files_to_ate(self, scannet_tree):
        """ScanNet tree on disk (metadata txt, per-frame pose/intrinsics/
        label files, JPEG color, 16-bit depth) -> DataLoader -> managed
        SLAM -> loop closure -> millimeter ATE."""
        from gradslam_tpu.datasets import DataLoader, Scannet

        ds = Scannet(
            str(scannet_tree / "scans"),
            str(scannet_tree / "meta"),
            scenes=("scene0042_00",),
            height=H,
            width=W,
        )
        assert len(ds) == 1
        loader = DataLoader(
            ds, batch_size=1, num_workers=2, to_device=True
        )
        batches, gt = [], None
        for colors, depths, K, poses, transforms, names, labels in loader:
            batches.append((colors, depths, K))
            gt = np.asarray(poses)
            assert labels.shape == (1, N_FRAMES, H, W, 1)
        ates = _run_chain(batches, gt)
        assert ates.max() < 5e-3, f"ATE too large: {ates}"




@pytest.fixture(scope="module")
def tum_tree_hires(tmp_path_factory, rendered):
    """TUM tree with 16x noisy color PNGs: decode cost is a substantial
    fraction of compute, so the IO-overlap measurement has a margin well
    above scheduler jitter."""
    colors, depths, poses = rendered
    rng = np.random.RandomState(11)
    root = tmp_path_factory.mktemp("tum_e2e_hires")
    seq = root / "rgbd_dataset_freiburg1_render"
    (seq / "rgb").mkdir(parents=True)
    (seq / "depth").mkdir()
    up4 = np.ones((4, 4), np.uint16)
    up16 = np.ones((16, 16), np.uint8)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(N_FRAMES):
        t = 100.0 + i * 0.033
        c16 = np.stack(
            [np.kron(colors[i][..., ch], up16) for ch in range(3)], -1
        ).astype(np.int16)
        c16 += rng.randint(-1, 2, c16.shape).astype(np.int16)
        imageio.imwrite(
            str(seq / "rgb" / f"{t:.6f}.png"),
            np.clip(c16, 0, 255).astype(np.uint8),
        )
        d16 = np.round(depths[i] * 5000.0).astype(np.uint16)
        imageio.imwrite(
            str(seq / "depth" / f"{t:.6f}.png"), np.kron(d16, up4)
        )
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t:.6f} depth/{t:.6f}.png")
        tx, ty, tz = poses[i][:3, 3]
        gt_lines.append(f"{t:.6f} {tx:.6f} {ty:.6f} {tz:.6f} 0 0 0 1")
    (seq / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines))
    (seq / "depth.txt").write_text("# depth\n" + "\n".join(depth_lines))
    (seq / "groundtruth.txt").write_text("# gt\n" + "\n".join(gt_lines))
    return root


class TestIOComputeOverlap:
    def test_prefetching_loader_overlaps_decode_with_compute(
        self, tum_tree_hires
    ):
        """IO-included fps: streaming batches through the prefetching
        DataLoader while SLAM runs must beat strictly serial
        load-then-compute — the decode of batch k+1 overlaps the solve of
        batch k (worker threads + async dispatch). Requires at least half
        the decode time to be hidden, measured min-of-2 to damp jitter."""
        import jax

        from gradslam_tpu.datasets import TUM, DataLoader
        from gradslam_tpu.slam import SLAMOptions, slam_sequence

        ds = TUM(
            str(tum_tree_hires), seqlen=6, stride=1, height=H, width=W,
            use_native=True,
        )
        n_batches = len(ds)  # overlapping windows -> several batches
        assert n_batches >= 6
        opts = SLAMOptions(odom="gradicp", numiters=4, dsratio=2,
                           fusion=True)
        cap = 6 * H * W

        @jax.jit
        def step(c, d, k):
            m, poses = slam_sequence(c, d, k, None, opts, cap)
            return poses.sum() + m.points.sum()

        def batches():
            return DataLoader(
                ds, batch_size=1, num_workers=4, prefetch=4,
                to_device=True, shuffle=False,
            )

        # warm the compile
        for colors, depths, K, *_ in batches():
            float(step(colors, depths, K))
            break

        def measure_serial():
            t0 = time.perf_counter()
            loaded = [
                (c, d, k)
                for c, d, k, *_ in DataLoader(
                    ds, batch_size=1, num_workers=0, to_device=True
                )
            ]
            t_io = time.perf_counter() - t0
            t0 = time.perf_counter()
            outs = [step(c, d, k) for c, d, k in loaded]
            float(sum(float(o) for o in outs))
            return t_io, time.perf_counter() - t0

        def measure_overlapped():
            t0 = time.perf_counter()
            outs = [step(c, d, k) for c, d, k, *_ in batches()]
            float(sum(float(o) for o in outs))
            return time.perf_counter() - t0

        t_io, t_compute = map(min, zip(measure_serial(), measure_serial()))
        t_overlap = min(measure_overlapped(), measure_overlapped())

        fps = n_batches * 6 / t_overlap
        on_accelerator = jax.devices()[0].platform != "cpu"
        if on_accelerator:
            # compute is off-host: at least a quarter of the decode time
            # must be hidden behind the device solve
            assert t_overlap < t_io + t_compute - 0.25 * t_io, (
                f"no overlap: {t_overlap:.3f}s vs io {t_io:.3f}s + "
                f"compute {t_compute:.3f}s"
            )
        else:
            # CPU-backend run (the virtual-mesh CI environment): XLA
            # compute saturates the host cores, so decode workers CONTEND
            # instead of hiding — true overlap is unmeasurable here
            # (observed: hiding when XLA leaves cores idle, up to +16%
            # contention when it does not, varying with machine load).
            # Assert the loader is not pathologically slower than strictly
            # serial load-then-compute; the hiding property is asserted on
            # a real accelerator (GRADSLAM_TPU_TEST_REAL=1).
            assert t_overlap < 1.4 * (t_io + t_compute), (
                f"prefetching loader pathologically slow: {t_overlap:.3f}s "
                f"vs serial {t_io + t_compute:.3f}s"
            )
            # Surface the coverage gap in test reports instead of silently
            # passing a weaker assertion: the hiding property itself was NOT
            # verified on this backend.
            pytest.skip(
                "decode/compute overlap property requires an accelerator "
                "backend (run with GRADSLAM_TPU_TEST_REAL=1); CPU run only "
                "verified the loader is not pathologically slow"
            )
        print(
            f"\nIO-included throughput: {fps:.1f} frames/s "
            f"(io {t_io:.3f}s, compute {t_compute:.3f}s, "
            f"overlapped {t_overlap:.3f}s)"
        )
