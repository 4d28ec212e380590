import jax
import jax.numpy as jnp
import numpy as np

from gradslam_tpu.structures import (
    append_to_map,
    init_map,
    map_mask,
    map_to_pointclouds,
)


class TestMapArena:
    def test_init_empty(self):
        m = init_map(2, 100)
        assert m.capacity == 100
        assert np.asarray(map_mask(m)).sum() == 0

    def test_append_basic(self):
        m = init_map(2, 10)
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.randn(2, 4, 3).astype(np.float32))
        mask = jnp.asarray([[True, True, False, True], [False, True, False, False]])
        m2 = append_to_map(m, pts, pts, pts, jnp.ones((2, 4, 1)), mask)
        np.testing.assert_array_equal(np.asarray(m2.num_points), [3, 1])
        # batch 0: rows 0,1,3 land in slots 0,1,2
        np.testing.assert_allclose(np.asarray(m2.points[0, :3]), np.asarray(pts[0, [0, 1, 3]]))
        np.testing.assert_allclose(np.asarray(m2.points[1, :1]), np.asarray(pts[1, [1]]))
        # untouched slots stay zero
        assert (np.asarray(m2.points[0, 3:]) == 0).all()

    def test_append_twice_concatenates(self):
        m = init_map(1, 10)
        p1 = jnp.ones((1, 3, 3))
        p2 = jnp.full((1, 2, 3), 2.0)
        all_true = lambda n: jnp.ones((1, n), dtype=bool)
        m = append_to_map(m, p1, p1, p1, jnp.ones((1, 3, 1)), all_true(3))
        m = append_to_map(m, p2, p2, p2, jnp.ones((1, 2, 1)), all_true(2))
        np.testing.assert_array_equal(np.asarray(m.num_points), [5])
        np.testing.assert_allclose(np.asarray(m.points[0, :3]), 1.0)
        np.testing.assert_allclose(np.asarray(m.points[0, 3:5]), 2.0)

    def test_overflow_drops(self):
        m = init_map(1, 4)
        pts = jnp.ones((1, 6, 3))
        m2 = append_to_map(
            m, pts, pts, pts, jnp.ones((1, 6, 1)), jnp.ones((1, 6), dtype=bool)
        )
        np.testing.assert_array_equal(np.asarray(m2.num_points), [4])

    def test_jit_and_scan_safe(self):
        @jax.jit
        def step(m, pts):
            mask = jnp.ones(pts.shape[:2], dtype=bool)
            return append_to_map(m, pts, pts, pts, pts[..., :1], mask)

        m = init_map(1, 50)
        for i in range(3):
            m = step(m, jnp.full((1, 5, 3), float(i)))
        np.testing.assert_array_equal(np.asarray(m.num_points), [15])

    def test_to_pointclouds(self):
        m = init_map(2, 10)
        pts = jnp.ones((2, 3, 3))
        mask = jnp.asarray([[True, True, True], [True, False, False]])
        m = append_to_map(m, pts, pts, pts, jnp.ones((2, 3, 1)), mask)
        pc = map_to_pointclouds(m)
        np.testing.assert_array_equal(
            np.asarray(pc.num_points_per_pointcloud), [3, 1]
        )

    def test_gradients_flow_through_append(self):
        def f(pts):
            m = init_map(1, 10)
            mask = jnp.ones(pts.shape[:2], dtype=bool)
            m = append_to_map(m, pts, pts, pts, pts[..., :1], mask)
            return jnp.sum(m.points ** 2)

        g = jax.grad(f)(jnp.ones((1, 4, 3)))
        np.testing.assert_allclose(np.asarray(g), 2.0)


class TestCompactMap:
    def test_evicts_low_confidence(self):
        from gradslam_tpu.structures import compact_map

        m = init_map(1, 20)
        pts = jnp.arange(18).reshape(1, 6, 3).astype(jnp.float32)
        cc = jnp.asarray([[0.1], [2.0], [0.2], [3.0], [0.1], [5.0]])[None]
        m = append_to_map(m, pts, pts, pts, cc, jnp.ones((1, 6), bool))
        m2 = compact_map(m, min_ccount=1.0)
        np.testing.assert_array_equal(np.asarray(m2.num_points), [3])
        # survivors in original order: rows 1, 3, 5
        np.testing.assert_allclose(
            np.asarray(m2.points[0, :3]), np.asarray(pts[0, [1, 3, 5]])
        )
        np.testing.assert_allclose(
            np.asarray(m2.ccounts[0, :3, 0]), [2.0, 3.0, 5.0]
        )
        # freed slots are zeroed
        assert (np.asarray(m2.data[0, 3:]) == 0).all()

    def test_keep_recent_protects_new_points(self):
        from gradslam_tpu.structures import compact_map

        m = init_map(1, 10)
        pts = jnp.ones((1, 4, 3))
        cc = jnp.full((1, 4, 1), 0.1)  # all low confidence
        m = append_to_map(m, pts, pts, pts, cc, jnp.ones((1, 4), bool))
        m2 = compact_map(m, min_ccount=1.0, keep_recent=2)
        np.testing.assert_array_equal(np.asarray(m2.num_points), [2])

    def test_jittable(self):
        from gradslam_tpu.structures import compact_map

        m = init_map(2, 16)
        pts = jnp.ones((2, 8, 3))
        cc = jnp.ones((2, 8, 1))
        m = append_to_map(m, pts, pts, pts, cc, jnp.ones((2, 8), bool))
        m2 = jax.jit(lambda s: compact_map(s, min_ccount=0.5))(m)
        np.testing.assert_array_equal(np.asarray(m2.num_points), [8, 8])


class TestVoxelCompactMap:
    def test_merges_colocated_points(self):
        from gradslam_tpu.structures import voxel_compact_map

        m = init_map(1, 16)
        # three points in one 0.1-cell, one far away
        pts = jnp.asarray(
            [[[0.01, 0.0, 0.0], [0.02, 0.0, 0.0], [0.03, 0.0, 0.0],
              [5.0, 5.0, 5.0]]]
        )
        cc = jnp.asarray([[[1.0], [1.0], [2.0], [1.0]]])
        m = append_to_map(m, pts, pts, pts, cc, jnp.ones((1, 4), bool))
        m2 = voxel_compact_map(m, voxel_size=0.1)
        np.testing.assert_array_equal(np.asarray(m2.num_points), [2])
        got = np.sort(np.asarray(m2.ccounts[0, :2, 0]))
        np.testing.assert_allclose(got, [1.0, 4.0])
        # merged position is the ccount-weighted mean
        merged_x = (0.01 * 1 + 0.02 * 1 + 0.03 * 2) / 4
        xs = np.sort(np.asarray(m2.points[0, :2, 0]))
        np.testing.assert_allclose(xs, [merged_x, 5.0], atol=1e-6)

    def test_jittable_and_idempotent(self):
        from gradslam_tpu.structures import voxel_compact_map

        m = init_map(2, 32)
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.uniform(-1, 1, (2, 20, 3)).astype(np.float32))
        cc = jnp.ones((2, 20, 1))
        m = append_to_map(m, pts, pts, pts, cc, jnp.ones((2, 20), bool))
        f = jax.jit(lambda s: voxel_compact_map(s, 0.3))
        m1 = f(m)
        m2 = f(m1)
        np.testing.assert_array_equal(
            np.asarray(m1.num_points), np.asarray(m2.num_points)
        )
        np.testing.assert_allclose(
            np.asarray(m1.points), np.asarray(m2.points), atol=1e-6
        )
