import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.geometry import se3_exp
from gradslam_tpu.structures import Pointclouds


def make_clouds(rng, counts=(5, 8, 3), with_attrs=True):
    pts = [rng.randn(n, 3).astype(np.float32) for n in counts]
    if not with_attrs:
        return Pointclouds(points=pts)
    nrm = [rng.randn(n, 3).astype(np.float32) for n in counts]
    col = [rng.rand(n, 3).astype(np.float32) for n in counts]
    feat = [rng.rand(n, 1).astype(np.float32) for n in counts]
    return Pointclouds(points=pts, normals=nrm, colors=col, features=feat)


class TestInit:
    def test_from_list(self):
        rng = np.random.RandomState(0)
        pc = make_clouds(rng)
        assert len(pc) == 3
        assert pc.capacity == 8
        np.testing.assert_array_equal(
            np.asarray(pc.num_points_per_pointcloud), [5, 8, 3]
        )
        assert not pc.equisized
        assert pc.has_points and pc.has_normals and pc.has_colors and pc.has_features

    def test_padding_zeros(self):
        rng = np.random.RandomState(1)
        pc = make_clouds(rng)
        padded = np.asarray(pc.points_padded)
        mask = np.asarray(pc.nonpad_mask)
        assert (padded[~mask] == 0).all()

    def test_list_round_trip(self):
        rng = np.random.RandomState(2)
        pts = [rng.randn(n, 3).astype(np.float32) for n in (4, 6)]
        pc = Pointclouds(points=pts)
        out = pc.points_list
        for a, b in zip(out, pts):
            np.testing.assert_allclose(np.asarray(a), b)

    def test_from_padded(self):
        pts = jnp.ones((2, 10, 3))
        pc = Pointclouds(points=pts, num_points=jnp.array([10, 4]))
        assert np.asarray(pc.nonpad_mask).sum() == 14

    def test_empty(self):
        pc = Pointclouds()
        assert len(pc) == 0
        assert not pc.has_points

    def test_mismatched_counts_raise(self):
        rng = np.random.RandomState(3)
        with pytest.raises(ValueError):
            Pointclouds(
                points=[rng.randn(5, 3)], normals=[rng.randn(4, 3)]
            )


class TestOps:
    def test_offset_scale(self):
        rng = np.random.RandomState(4)
        pc = make_clouds(rng, counts=(3, 5))
        out = (pc + 1.0) * 2.0
        mask = np.asarray(pc.nonpad_mask)
        expect = (np.asarray(pc.points_padded) + 1.0) * 2.0
        np.testing.assert_allclose(
            np.asarray(out.points_padded)[mask], expect[mask], rtol=1e-6
        )
        # padding stays zero
        assert (np.asarray(out.points_padded)[~mask] == 0).all()

    def test_div(self):
        rng = np.random.RandomState(5)
        pc = make_clouds(rng, counts=(4,))
        out = pc / 2.0
        np.testing.assert_allclose(
            np.asarray(out.points_padded), np.asarray(pc.points_padded) / 2.0
        )

    def test_matmul_se3(self):
        rng = np.random.RandomState(6)
        pc = make_clouds(rng, counts=(4, 4))
        T = np.asarray(se3_exp(jnp.asarray(rng.randn(6).astype(np.float32) * 0.3)))
        out = pc @ jnp.asarray(T)
        # post-multiply: p_homo @ T, taking first 3 coords
        expect = (
            np.concatenate(
                [np.asarray(pc.points_padded), np.ones((2, 4, 1), np.float32)], -1
            )
            @ T
        )[..., :3]
        np.testing.assert_allclose(np.asarray(out.points_padded), expect, rtol=1e-5)

    def test_transform_matches_manual(self):
        rng = np.random.RandomState(7)
        pc = make_clouds(rng, counts=(6, 2))
        T = np.asarray(se3_exp(jnp.asarray(rng.randn(6).astype(np.float32) * 0.2)))
        out = pc.transform(jnp.asarray(T))
        mask = np.asarray(pc.nonpad_mask)
        pts = np.asarray(pc.points_padded)
        expect = pts @ T[:3, :3].T + T[:3, 3]
        np.testing.assert_allclose(
            np.asarray(out.points_padded)[mask], expect[mask], atol=1e-5
        )
        # normals rotated only
        nrm = np.asarray(pc.normals_padded)
        np.testing.assert_allclose(
            np.asarray(out.normals_padded)[mask], (nrm @ T[:3, :3].T)[mask], atol=1e-5
        )

    def test_pinhole_projection(self):
        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 100.0
        K[0, 2], K[1, 2] = 50.0, 40.0
        pts = jnp.asarray([[[0.0, 0.0, 2.0], [0.1, -0.1, 1.0]]])
        pc = Pointclouds(points=pts)
        out = np.asarray(pc.pinhole_projection(jnp.asarray(K)).points_padded)
        np.testing.assert_allclose(
            out[0], [[50.0, 40.0, 1.0], [60.0, 30.0, 1.0]], rtol=1e-5
        )


class TestAppend:
    def test_append_points(self):
        rng = np.random.RandomState(8)
        a = make_clouds(rng, counts=(2, 3))
        b = make_clouds(rng, counts=(4, 1))
        out = a.append_points(b)
        np.testing.assert_array_equal(
            np.asarray(out.num_points_per_pointcloud), [6, 4]
        )
        al, bl, ol = a.points_list, b.points_list, out.points_list
        for i in range(2):
            np.testing.assert_allclose(
                np.asarray(ol[i]),
                np.concatenate([np.asarray(al[i]), np.asarray(bl[i])]),
                rtol=1e-6,
            )

    def test_append_to_empty(self):
        rng = np.random.RandomState(9)
        b = make_clouds(rng, counts=(4, 1))
        out = Pointclouds().append_points(b)
        np.testing.assert_array_equal(
            np.asarray(out.num_points_per_pointcloud), [4, 1]
        )


class TestCloneDetach:
    def test_detach_stops_gradient(self):
        pts = jnp.ones((1, 3, 3))

        def f(p):
            pc = Pointclouds(points=p)
            return jnp.sum(pc.detach().points_padded ** 2)

        g = jax.grad(f)(pts)
        np.testing.assert_allclose(np.asarray(g), 0.0)

    def test_grad_flows_through_ops(self):
        pts = jnp.ones((1, 3, 3))

        def f(p):
            pc = Pointclouds(points=p)
            return jnp.sum(((pc * 2.0) + 1.0).points_padded)

        g = jax.grad(f)(pts)
        np.testing.assert_allclose(np.asarray(g), 2.0)

    def test_indexing(self):
        rng = np.random.RandomState(10)
        pc = make_clouds(rng, counts=(5, 8, 3))
        sub = pc[1]
        assert len(sub) == 1
        np.testing.assert_array_equal(
            np.asarray(sub.num_points_per_pointcloud), [8]
        )


class TestParityShims:
    def test_num_features(self):
        import numpy as np

        pc = Pointclouds(
            points=[np.zeros((4, 3), np.float32)],
            features=[np.ones((4, 2), np.float32)],
        )
        assert pc.num_features == 2
        assert Pointclouds(points=[np.zeros((4, 3), np.float32)]).num_features == 0

    def test_inplace_aliases_match_functional(self):
        import numpy as np

        pc = Pointclouds(points=[np.arange(12, dtype=np.float32).reshape(4, 3)])
        np.testing.assert_allclose(
            np.asarray(pc.offset_(1.0).points_padded),
            np.asarray(pc.offset(1.0).points_padded),
        )
        np.testing.assert_allclose(
            np.asarray(pc.scale_(2.0).points_padded),
            np.asarray(pc.scale(2.0).points_padded),
        )

    def test_device_movement(self):
        import jax
        import numpy as np

        pc = Pointclouds(points=[np.zeros((4, 3), np.float32)]).cpu()
        assert pc.points_padded.devices() == {jax.devices("cpu")[0]}
        back = pc.cuda()
        assert back.points_padded.devices() == {jax.devices()[0]}
