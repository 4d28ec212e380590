import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.structures import RGBDImages


@pytest.fixture
def rgbd(msrd_data):
    return RGBDImages(
        msrd_data["colors"],
        msrd_data["depths"],
        msrd_data["intrinsics"],
        msrd_data["poses"],
    )


def mse(a, b):
    return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))


class TestGoldenMaps:
    """Golden-data parity (reference tests/structures/test_rgbdimages.py:60-112)."""

    def test_vertex_map(self, rgbd, msrd_data):
        assert mse(rgbd.vertex_map, msrd_data["vertex_map"]) < 1e-10

    def test_global_vertex_map(self, rgbd, msrd_data):
        assert mse(rgbd.global_vertex_map, msrd_data["global_vertex_map"]) < 1e-10

    def test_normal_map(self, rgbd, msrd_data):
        assert mse(rgbd.normal_map, msrd_data["normal_map"]) < 1e-8

    def test_global_normal_map(self, rgbd, msrd_data):
        assert mse(rgbd.global_normal_map, msrd_data["global_normal_map"]) < 1e-8

    def test_global_differs_from_local(self, rgbd):
        # poses are non-identity after frame 0, so global != local
        # (fixture motion is small: golden MSE between the two is ~2e-7)
        assert mse(rgbd.global_vertex_map, rgbd.vertex_map) > 1e-8

    def test_channels_first_layout(self, msrd_data):
        cf = RGBDImages(
            np.transpose(msrd_data["colors"], (0, 1, 4, 2, 3)),
            np.transpose(msrd_data["depths"], (0, 1, 4, 2, 3)),
            msrd_data["intrinsics"],
            msrd_data["poses"],
            channels_first=True,
        )
        vm = np.asarray(cf.vertex_map)
        assert vm.shape == (2, 3, 3, 120, 160)
        expect = np.transpose(msrd_data["vertex_map"], (0, 1, 4, 2, 3))
        assert mse(vm, expect) < 1e-10


class TestRGBDImagesAPI:
    def test_shape(self, rgbd):
        assert rgbd.shape == (2, 3, 120, 160)
        assert len(rgbd) == 2

    def test_valid_depth_mask(self, rgbd, msrd_data):
        mask = np.asarray(rgbd.valid_depth_mask)
        np.testing.assert_array_equal(mask, msrd_data["depths"] > 0)

    def test_indexing(self, rgbd):
        sub = rgbd[0, 1]
        assert sub.shape == (1, 1, 120, 160)
        np.testing.assert_allclose(
            np.asarray(sub.vertex_map[0, 0]), np.asarray(rgbd.vertex_map[0, 1])
        )

    def test_no_poses_global_equals_local(self, msrd_data):
        r = RGBDImages(
            msrd_data["colors"], msrd_data["depths"], msrd_data["intrinsics"]
        )
        assert not r.has_poses
        np.testing.assert_allclose(
            np.asarray(r.global_vertex_map), np.asarray(r.vertex_map)
        )

    def test_poses_setter_invalidates_cache(self, rgbd, msrd_data):
        gv1 = np.asarray(rgbd.global_vertex_map).copy()
        B, L = 2, 3
        eye = np.broadcast_to(np.eye(4, dtype=np.float32), (B, L, 4, 4))
        rgbd.poses = eye
        gv2 = np.asarray(rgbd.global_vertex_map)
        assert mse(gv1, gv2) > 1e-9  # cache actually recomputed
        np.testing.assert_allclose(gv2, np.asarray(rgbd.vertex_map), atol=1e-6)

    def test_validation_errors(self, msrd_data):
        with pytest.raises(ValueError):
            RGBDImages(
                msrd_data["colors"][..., :2],  # wrong channels
                msrd_data["depths"],
                msrd_data["intrinsics"],
            )
        with pytest.raises(ValueError):
            RGBDImages(
                msrd_data["colors"],
                msrd_data["depths"],
                np.eye(4, dtype=np.float32),  # wrong intrinsics rank
            )

    def test_astype(self, rgbd):
        r16 = rgbd.astype(jnp.bfloat16)
        assert r16.rgb_image.dtype == jnp.bfloat16


class TestParityShims:
    def _mk(self):
        import numpy as np

        rng = np.random.RandomState(0)
        return RGBDImages(
            jnp.asarray(rng.rand(2, 3, 8, 10, 3).astype(np.float32)),
            jnp.asarray(rng.rand(2, 3, 8, 10, 1).astype(np.float32)),
            jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (2, 1, 1, 1))),
        )

    def test_cdim_and_inplace_layout_toggles(self):
        rgbd = self._mk()
        assert rgbd.cdim == 4
        assert rgbd.to_channels_first_() is rgbd
        assert rgbd.cdim == 2
        assert rgbd.rgb_image.shape == (2, 3, 3, 8, 10)
        assert rgbd.to_channels_last_() is rgbd
        assert rgbd.rgb_image.shape == (2, 3, 8, 10, 3)

    def test_pixel_pos(self):
        import numpy as np

        rgbd = self._mk()
        pp = np.asarray(rgbd.pixel_pos)
        assert pp.shape == (2, 3, 8, 10, 3)
        # [u(col), v(row), 1] ordering (reference rgbdimages.py:654-661)
        np.testing.assert_allclose(pp[0, 0, 2, 7], [7.0, 2.0, 1.0])
        np.testing.assert_allclose(pp[..., 2], 1.0)

    def test_device_movement(self):
        import jax

        rgbd = self._mk().cpu()
        assert rgbd.rgb_image.devices() == {jax.devices("cpu")[0]}
        back = rgbd.to(jax.devices()[0])
        assert back.rgb_image.devices() == {jax.devices()[0]}
        assert back.channels_first == rgbd.channels_first
