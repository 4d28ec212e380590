"""Loader tests against generated synthetic datasets.

The reference's dataset tests skip in CI (hardcoded local paths,
tests/datasets/test_tum.py:14-17); here we generate tiny on-disk datasets
in the expected formats so the loaders are actually exercised.
"""

import numpy as np
import pytest

import imageio.v2 as imageio

from gradslam_tpu.datasets import ICL, TUM, Scannet
from gradslam_tpu.datasets.tumutils import (
    associate,
    read_file_list,
    read_trajectory,
    transform44,
)


def _write_png16(path, arr):
    imageio.imwrite(str(path), arr.astype(np.uint16))


def _write_png8(path, arr):
    imageio.imwrite(str(path), arr.astype(np.uint8))


N_FRAMES = 12
H_RAW, W_RAW = 48, 64


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("tum")
    seq = root / "rgbd_dataset_freiburg1_test"
    (seq / "rgb").mkdir(parents=True)
    (seq / "depth").mkdir()
    rng = np.random.RandomState(0)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(N_FRAMES):
        t = 1000.0 + i * 0.033
        rgb = rng.randint(0, 255, (H_RAW, W_RAW, 3))
        dep = rng.randint(1000, 30000, (H_RAW, W_RAW))
        _write_png8(seq / "rgb" / f"{t:.6f}.png", rgb)
        _write_png16(seq / "depth" / f"{t + 0.005:.6f}.png", dep)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t + 0.005:.6f} depth/{t + 0.005:.6f}.png")
        # slowly translating pose with identity rotation
        gt_lines.append(
            f"{t + 0.002:.6f} {0.1 * i:.4f} {0.05 * i:.4f} 0.0 0 0 0 1"
        )
    (seq / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines))
    (seq / "depth.txt").write_text("# depth\n" + "\n".join(depth_lines))
    (seq / "groundtruth.txt").write_text("# gt\n" + "\n".join(gt_lines))
    return root


class TestTUM:
    def test_basic_shapes(self, tum_dir):
        ds = TUM(str(tum_dir), seqlen=4, height=24, width=32)
        assert len(ds) == 3  # 12 frames, non-overlapping windows of 4
        colors, depths, K, poses, transforms, name, stamps = ds[0]
        assert colors.shape == (4, 24, 32, 3)
        assert depths.shape == (4, 24, 32, 1)
        assert K.shape == (1, 4, 4)
        assert poses.shape == (4, 4, 4)
        assert transforms.shape == (4, 4, 4)
        assert name == "rgbd_dataset_freiburg1_test"
        assert stamps.shape == (4, 3)

    def test_depth_scale(self, tum_dir):
        ds = TUM(str(tum_dir), seqlen=2, height=48, width=64)
        _, depths, *_ = ds[0]
        assert depths.max() <= 30000 / 5000.0 + 1e-6
        assert depths.min() >= 1000 / 5000.0 - 1e-6

    def test_intrinsics_scaling(self, tum_dir):
        ds = TUM(str(tum_dir), seqlen=2, height=240, width=320)
        K = ds[0][2]
        assert K[0, 0, 0] == pytest.approx(525.0 * 320 / 640)
        assert K[0, 1, 1] == pytest.approx(525.0 * 240 / 480)

    def test_pose_rebasing(self, tum_dir):
        ds = TUM(str(tum_dir), seqlen=3, height=24, width=32)
        poses = ds[0][3]
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
        # known translation 0.1/frame in x after rebase
        np.testing.assert_allclose(poses[1][0, 3], 0.1, atol=1e-5)

    def test_dilation_and_stride(self, tum_dir):
        ds = TUM(str(tum_dir), seqlen=3, dilation=1, stride=2, height=24, width=32)
        # window span = 3 frames with dilation 1 -> indices 0,2,4
        poses = ds[0][3]
        np.testing.assert_allclose(poses[1][0, 3], 0.2, atol=1e-5)
        # second sample starts at frame 2
        poses1 = ds[1][3]
        np.testing.assert_allclose(poses1[0], np.eye(4), atol=1e-6)

    def test_start_end(self, tum_dir):
        ds = TUM(str(tum_dir), seqlen=2, start=4, end=8, height=24, width=32)
        assert len(ds) == 2

    def test_channels_first(self, tum_dir):
        ds = TUM(str(tum_dir), seqlen=2, height=24, width=32, channels_first=True)
        colors, depths, *_ = ds[0]
        assert colors.shape == (2, 3, 24, 32)
        assert depths.shape == (2, 1, 24, 32)

    def test_normalize_color(self, tum_dir):
        ds = TUM(str(tum_dir), seqlen=2, height=24, width=32, normalize_color=True)
        colors = ds[0][0]
        assert colors.max() <= 1.0

    def test_return_flags(self, tum_dir):
        ds = TUM(
            str(tum_dir),
            seqlen=2,
            height=24,
            width=32,
            return_depth=False,
            return_pose=False,
            return_transform=False,
            return_names=False,
            return_timestamps=False,
        )
        out = ds[0]
        assert len(out) == 2  # colors + intrinsics

    def test_bad_args(self, tum_dir):
        with pytest.raises(ValueError):
            TUM(str(tum_dir), seqlen=2, start=5, end=5)
        with pytest.raises(ValueError):
            TUM(str(tum_dir / "missing"))


@pytest.fixture(scope="module")
def icl_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("icl")
    traj = root / "living_room_traj1_frei_png"
    (traj / "rgb").mkdir(parents=True)
    (traj / "depth").mkdir()
    rng = np.random.RandomState(1)
    assoc, simrows = [], []
    for i in range(8):
        rgb = rng.randint(0, 255, (H_RAW, W_RAW, 3))
        dep = rng.randint(1000, 20000, (H_RAW, W_RAW))
        _write_png8(traj / "rgb" / f"{i}.png", rgb)
        _write_png16(traj / "depth" / f"{i}.png", dep)
        assoc.append(f"{i} depth/{i}.png {i} rgb/{i}.png")
        T = np.eye(4)
        T[0, 3] = 0.05 * i
        simrows.append(
            "\n".join(
                " ".join(f"{v:.6f}" for v in row) for row in T[:3]
            )
        )
    (traj / "associations.txt").write_text("\n".join(assoc))
    (traj / "livingRoom1n.gt.sim").write_text("\n\n".join(simrows))
    return root


class TestICL:
    def test_basic(self, icl_dir):
        ds = ICL(str(icl_dir), seqlen=4, height=24, width=32)
        assert len(ds) == 2
        colors, depths, K, poses, transforms, name = ds[0]
        assert colors.shape == (4, 24, 32, 3)
        assert K[0, 1, 1] < 0  # ICL's negative fy convention
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
        np.testing.assert_allclose(poses[1][0, 3], 0.05, atol=1e-5)


@pytest.fixture(scope="module")
def scannet_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet")
    scans = root / "scans"
    meta = root / "meta"
    meta.mkdir()
    scene = scans / "scene0000_00"
    for sub in ("color", "depth", "pose", "label-filt", "intrinsic"):
        (scene / sub).mkdir(parents=True)
    rng = np.random.RandomState(2)
    np.savetxt(
        scene / "intrinsic" / "intrinsic_depth.txt",
        np.array(
            [[80.0, 0, 32, 0], [0, 80.0, 24, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
        ),
    )
    lines = []
    for i in range(6):
        _write_png8(
            scene / "color" / f"{i}.jpg", rng.randint(0, 255, (H_RAW, W_RAW, 3))
        )
        _write_png16(
            scene / "depth" / f"{i}.png", rng.randint(500, 5000, (H_RAW, W_RAW))
        )
        _write_png16(
            scene / "label-filt" / f"{i}.png",
            rng.randint(0, 40, (H_RAW, W_RAW)),
        )
        T = np.eye(4)
        T[1, 3] = 0.1 * i
        np.savetxt(scene / "pose" / f"{i}.txt", T)
        lines.append(
            f"color scene0000_00/color/{i}.jpg "
            f"depth scene0000_00/depth/{i}.png "
            f"pose scene0000_00/pose/{i}.txt "
            f"label-filt scene0000_00/label-filt/{i}.png "
            "x a x b x c "
            f"intrinsic_depth scene0000_00/intrinsic/intrinsic_depth.txt"
        )
    (meta / "scene0000_00-seq_0.txt").write_text("\n".join(lines))
    return root


class TestScannet:
    def test_basic(self, scannet_dir):
        ds = Scannet(
            str(scannet_dir / "scans"),
            str(scannet_dir / "meta"),
            scenes=("scene0000_00",),
            height=24,
            width=32,
        )
        assert len(ds) == 1
        colors, depths, K, poses, transforms, name, labels = ds[0]
        assert colors.shape == (6, 24, 32, 3)
        assert depths.shape == (6, 24, 32, 1)
        assert labels.shape == (6, 24, 32, 1)
        assert labels.max() <= 20  # scannet20 remap applied
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
        np.testing.assert_allclose(poses[2][1, 3], 0.2, atol=1e-5)

    def test_depth_scale_1000(self, scannet_dir):
        ds = Scannet(
            str(scannet_dir / "scans"),
            str(scannet_dir / "meta"),
            scenes=None,
            height=48,
            width=64,
        )
        depths = ds[0][1]
        assert depths.max() <= 5.0 + 1e-6

    def test_start_end(self, scannet_dir):
        ds = Scannet(
            str(scannet_dir / "scans"),
            str(scannet_dir / "meta"),
            scenes=None,
            start=2,
            end=5,
            height=24,
            width=32,
        )
        colors = ds[0][0]
        assert colors.shape[0] == 3


class TestTumUtils:
    def test_read_file_list(self, tum_dir):
        lst = read_file_list(
            str(tum_dir / "rgbd_dataset_freiburg1_test" / "rgb.txt")
        )
        assert len(lst) == N_FRAMES

    def test_associate_greedy(self):
        a = {1.0: ["a"], 2.0: ["b"]}
        b = {1.004: ["x"], 2.019: ["y"], 5.0: ["z"]}
        m = associate(a, b, 0.0, 0.02)
        assert m == [(1.0, 1.004), (2.0, 2.019)]

    def test_associate_respects_max_difference(self):
        a = {1.0: ["a"]}
        b = {1.5: ["x"]}
        assert associate(a, b, 0.0, 0.02) == []

    def test_read_trajectory_matrix(self, tum_dir):
        traj = read_trajectory(
            str(tum_dir / "rgbd_dataset_freiburg1_test" / "groundtruth.txt")
        )
        assert len(traj) == N_FRAMES
        stamp, T = next(iter(traj.items()))
        assert isinstance(stamp, str)
        assert T.shape == (4, 4)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-12)
        np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=0)

    def test_read_trajectory_raw_and_filters(self, tmp_path):
        p = tmp_path / "gt.txt"
        p.write_text(
            "# comment\n"
            "1.0 1 2 3 0 0 0 1\n"
            "2.0 4 5 6 0 0 0 0\n"  # zero quaternion: dropped
            "3.0 7 8 nan 0 0 0 1\n"  # NaN: dropped with warning
        )
        traj = read_trajectory(str(p), matrix=False)
        assert list(traj.keys()) == ["1.0"]
        assert traj["1.0"] == [1.0, 2.0, 3.0, 0.0, 0.0, 0.0, 1.0]

    def test_transform44_rotation(self):
        # 90 deg about z: q = (0, 0, sin45, cos45)
        s = np.sin(np.pi / 4)
        T = transform44(["t", 1.0, 2.0, 3.0, 0.0, 0.0, s, s])
        Rz = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        np.testing.assert_allclose(T[:3, :3], Rz, atol=1e-12)
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=0)


class TestNativeLoader:
    def test_native_matches_python_path(self, tum_dir):
        from gradslam_tpu.datasets import native_loader

        if not native_loader.native_available():
            pytest.skip("native loader toolchain unavailable")
        ds_py = TUM(str(tum_dir), seqlen=3, height=24, width=32, use_native=False)
        ds_nat = TUM(str(tum_dir), seqlen=3, height=24, width=32, use_native=True)
        cp, dp, *_ = ds_py[0]
        cn, dn, *_ = ds_nat[0]
        # same decode; resize implementations may differ by <=1 LSB
        assert np.abs(cp - cn).max() <= 1.0
        np.testing.assert_allclose(dp, dn, atol=1e-5)

    def test_native_full_resolution_exact(self, tum_dir):
        from gradslam_tpu.datasets import native_loader

        if not native_loader.native_available():
            pytest.skip("native loader toolchain unavailable")
        ds_py = TUM(str(tum_dir), seqlen=2, height=48, width=64, use_native=False)
        ds_nat = TUM(str(tum_dir), seqlen=2, height=48, width=64, use_native=True)
        np.testing.assert_allclose(ds_py[0][0], ds_nat[0][0], atol=1e-5)
        np.testing.assert_allclose(ds_py[0][1], ds_nat[0][1], atol=1e-6)
