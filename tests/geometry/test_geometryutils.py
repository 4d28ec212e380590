import jax.numpy as jnp
import numpy as np

from gradslam_tpu.geometry import (
    compose_transformations,
    create_meshgrid,
    inverse_transformation,
    quaternion_to_rotation_matrix,
    relative_transformation,
    se3_exp,
    transform_normals,
    transform_pointcloud,
)


def random_pose(rng, scale=0.5):
    xi = rng.randn(6).astype(np.float32) * scale
    return np.asarray(se3_exp(jnp.asarray(xi)))


class TestMeshgrid:
    def test_unnormalized_ordering(self):
        g = np.asarray(create_meshgrid(3, 4, normalized_coords=False))
        assert g.shape == (1, 3, 4, 2)
        # channel 0 = row index, channel 1 = col index (reference ordering)
        np.testing.assert_allclose(g[0, :, 0, 0], [0, 1, 2])
        np.testing.assert_allclose(g[0, 0, :, 1], [0, 1, 2, 3])

    def test_normalized_range(self):
        g = np.asarray(create_meshgrid(5, 7, normalized_coords=True))
        assert g.min() == -1.0 and g.max() == 1.0


class TestTransforms:
    def test_inverse(self):
        rng = np.random.RandomState(0)
        T = jnp.asarray(np.stack([random_pose(rng) for _ in range(4)]))
        Tinv = inverse_transformation(T)
        prod = np.asarray(jnp.matmul(T, Tinv))
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-5)

    def test_compose(self):
        rng = np.random.RandomState(1)
        A = jnp.asarray(random_pose(rng))
        B = jnp.asarray(random_pose(rng))
        np.testing.assert_allclose(
            np.asarray(compose_transformations(A, B)), np.asarray(A) @ np.asarray(B),
            rtol=1e-6,
        )

    def test_relative_transformation(self):
        rng = np.random.RandomState(2)
        T01 = jnp.asarray(random_pose(rng))
        T02 = jnp.asarray(random_pose(rng))
        T12 = relative_transformation(T01, T02)
        # T01 @ T12 == T02
        np.testing.assert_allclose(
            np.asarray(T01) @ np.asarray(T12), np.asarray(T02), atol=1e-5
        )

    def test_relative_transformation_orthogonal_fast_path(self):
        rng = np.random.RandomState(3)
        T01 = jnp.asarray(random_pose(rng))
        T02 = jnp.asarray(random_pose(rng))
        a = relative_transformation(T01, T02, orthogonal_rotations=False)
        b = relative_transformation(T01, T02, orthogonal_rotations=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestPointTransforms:
    def test_transform_pointcloud_identity(self):
        pts = jnp.asarray(np.random.RandomState(0).randn(10, 3).astype(np.float32))
        out = transform_pointcloud(pts, jnp.eye(4))
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)

    def test_transform_pointcloud_translation(self):
        pts = jnp.zeros((5, 3))
        T = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 2.0, 3.0]))
        out = np.asarray(transform_pointcloud(pts, T))
        np.testing.assert_allclose(out, np.broadcast_to([1.0, 2.0, 3.0], (5, 3)))

    def test_transform_normals_rotation_only(self):
        rng = np.random.RandomState(1)
        T = random_pose(rng).copy()
        T[:3, 3] = [10.0, -5.0, 2.0]  # translation must not affect normals
        n = jnp.asarray(rng.randn(7, 3).astype(np.float32))
        out = np.asarray(transform_normals(n, jnp.asarray(T)))
        expect = np.asarray(n) @ T[:3, :3].T
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_batched(self):
        rng = np.random.RandomState(4)
        T = jnp.asarray(np.stack([random_pose(rng) for _ in range(3)]))
        pts = jnp.asarray(rng.randn(3, 11, 3).astype(np.float32))
        out = transform_pointcloud(pts, T)
        assert out.shape == (3, 11, 3)
        for b in range(3):
            np.testing.assert_allclose(
                np.asarray(out[b]),
                np.asarray(transform_pointcloud(pts[b], T[b])),
                atol=1e-6,
            )


class TestQuaternion:
    def test_identity(self):
        q = jnp.array([0.0, 0.0, 0.0, 1.0])
        np.testing.assert_allclose(
            np.asarray(quaternion_to_rotation_matrix(q)), np.eye(3), atol=1e-6
        )

    def test_halfturn_z(self):
        # 180 deg about z: q = (0, 0, 1, 0)
        q = jnp.array([0.0, 0.0, 1.0, 0.0])
        R = np.asarray(quaternion_to_rotation_matrix(q))
        np.testing.assert_allclose(R, np.diag([-1.0, -1.0, 1.0]), atol=1e-6)

    def test_unnormalized_input_ok(self):
        q = jnp.array([0.0, 0.0, 2.0, 0.0])
        R = np.asarray(quaternion_to_rotation_matrix(q))
        np.testing.assert_allclose(R, np.diag([-1.0, -1.0, 1.0]), atol=1e-6)
