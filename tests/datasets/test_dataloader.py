"""DataLoader: collation, shuffling determinism, prefetch, error paths."""

import numpy as np
import pytest

from gradslam_tpu.datasets import DataLoader, default_collate


class ArrayDataset:
    """Synthetic dataset: sample i is (i-filled image, scalar, name)."""

    def __init__(self, n=10, shape=(4, 6, 3), delay=0.0):
        self.n, self.shape, self.delay = n, shape, delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            import time

            time.sleep(self.delay)
        return (
            np.full(self.shape, i, np.float32),
            np.float32(i),
            f"sample_{i}",
        )


class TestCollate:
    def test_arrays_stack_others_list(self):
        batch = default_collate([ArrayDataset()[i] for i in (3, 7)])
        assert batch[0].shape == (2, 4, 6, 3)
        np.testing.assert_array_equal(batch[1], [3.0, 7.0])
        assert batch[2] == ["sample_3", "sample_7"]

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            default_collate([])


class TestDataLoader:
    def test_sequential_content(self):
        dl = DataLoader(ArrayDataset(10), batch_size=3, num_workers=0)
        assert len(dl) == 3  # drop_last
        seen = [b for b in dl]
        assert len(seen) == 3
        np.testing.assert_array_equal(seen[0][1], [0, 1, 2])
        np.testing.assert_array_equal(seen[2][1], [6, 7, 8])

    def test_drop_last_false(self):
        dl = DataLoader(
            ArrayDataset(10), batch_size=3, drop_last=False, num_workers=0
        )
        seen = [b for b in dl]
        assert len(seen) == 4 and seen[-1][0].shape[0] == 1

    def test_shuffle_deterministic_and_epoch_varying(self):
        mk = lambda: DataLoader(
            ArrayDataset(12), batch_size=4, shuffle=True, seed=7,
            num_workers=0,
        )
        a = [tuple(b[1]) for b in mk()]
        b = [tuple(b[1]) for b in mk()]
        assert a == b  # same seed+epoch -> same order
        dl = mk()
        e1 = [tuple(x[1]) for x in dl]
        e2 = [tuple(x[1]) for x in dl]
        assert e1 != e2  # epochs reshuffle
        assert sorted(sum((list(t) for t in e2), [])) == list(range(12))

    def test_threaded_matches_sequential(self):
        ds = ArrayDataset(9, delay=0.005)
        seq = [b[1].tolist() for b in DataLoader(ds, 3, num_workers=0)]
        thr = [b[1].tolist() for b in DataLoader(ds, 3, num_workers=4)]
        assert seq == thr

    def test_worker_exception_propagates(self):
        class Broken(ArrayDataset):
            def __getitem__(self, i):
                if i == 4:
                    raise RuntimeError("decode failed")
                return super().__getitem__(i)

        dl = DataLoader(Broken(8), batch_size=2, num_workers=2)
        with pytest.raises(RuntimeError, match="decode failed"):
            list(dl)

    def test_to_device(self):
        import jax

        dl = DataLoader(
            ArrayDataset(4), batch_size=2, num_workers=0, to_device=True
        )
        batch = next(iter(dl))
        assert isinstance(batch[0], jax.Array)
        assert batch[2] == ["sample_0", "sample_1"]

    def test_bad_batch_size(self):
        with pytest.raises(ValueError):
            DataLoader(ArrayDataset(4), batch_size=0)

    def test_with_tum_loader(self, tmp_path):
        # real dataset protocol end-to-end (tiny on-disk TUM set)
        import imageio.v2 as imageio

        from gradslam_tpu.datasets import TUM

        seq = tmp_path / "rgbd_dataset_freiburg1_x"
        (seq / "rgb").mkdir(parents=True)
        (seq / "depth").mkdir()
        rng = np.random.RandomState(0)
        rl, dl_, gl = [], [], []
        for i in range(6):
            t = 1000.0 + i * 0.033
            imageio.imwrite(
                str(seq / "rgb" / f"{t:.6f}.png"),
                rng.randint(0, 255, (24, 32, 3)).astype(np.uint8),
            )
            imageio.imwrite(
                str(seq / "depth" / f"{t:.6f}.png"),
                rng.randint(1000, 30000, (24, 32)).astype(np.uint16),
            )
            rl.append(f"{t:.6f} rgb/{t:.6f}.png")
            dl_.append(f"{t:.6f} depth/{t:.6f}.png")
            gl.append(f"{t:.6f} {0.1*i:.4f} 0 0 0 0 0 1")
        (seq / "rgb.txt").write_text("\n".join(rl))
        (seq / "depth.txt").write_text("\n".join(dl_))
        (seq / "groundtruth.txt").write_text("\n".join(gl))

        ds = TUM(str(tmp_path), seqlen=3, height=12, width=16)
        loader = DataLoader(ds, batch_size=2, num_workers=2)
        colors, depths, K, poses, *rest = next(iter(loader))
        assert colors.shape == (2, 3, 12, 16, 3)
        assert depths.shape == (2, 3, 12, 16, 1)
        assert poses.shape == (2, 3, 4, 4)
