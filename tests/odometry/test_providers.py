"""Odometry provider behavior + validation batteries.

The reference devotes large error-raising test batteries to the providers
(tests/odometry/test_icp.py etc.); these cover the same contracts.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.geometry import se3_exp
from gradslam_tpu.odometry import (
    GradICPOdometryProvider,
    GroundTruthOdometryProvider,
    ICPOdometryProvider,
)
from gradslam_tpu.structures import Pointclouds, RGBDImages


@pytest.fixture
def frames(msrd_data):
    def make(s):
        return RGBDImages(
            msrd_data["colors"][:, s : s + 1],
            msrd_data["depths"][:, s : s + 1],
            msrd_data["intrinsics"],
            msrd_data["poses"][:, s : s + 1],
        )

    return make(0), make(1)


class TestGroundTruthProvider:
    def test_relative_transform(self, frames, msrd_data):
        f0, f1 = frames
        T = GroundTruthOdometryProvider().provide(f0, f1)
        assert T.shape == (2, 1, 4, 4)
        expect = np.linalg.inv(msrd_data["poses"][:, 0]) @ msrd_data["poses"][:, 1]
        np.testing.assert_allclose(np.asarray(T[:, 0]), expect, atol=1e-5)

    def test_requires_poses(self, msrd_data):
        f = RGBDImages(
            msrd_data["colors"][:, :1],
            msrd_data["depths"][:, :1],
            msrd_data["intrinsics"],
        )
        with pytest.raises(ValueError):
            GroundTruthOdometryProvider().provide(f, f)

    def test_requires_seqlen_1(self, msrd_data):
        f = RGBDImages(
            msrd_data["colors"],
            msrd_data["depths"],
            msrd_data["intrinsics"],
            msrd_data["poses"],
        )
        with pytest.raises(ValueError):
            GroundTruthOdometryProvider().provide(f, f)


def _clouds(msrd_data):
    from gradslam_tpu.structures.utils import pointclouds_from_rgbdimages

    rgbd = RGBDImages(
        msrd_data["colors"][:1, :1],
        msrd_data["depths"][:1, :1],
        msrd_data["intrinsics"][:1],
        msrd_data["poses"][:1, :1],
    )
    pc = pointclouds_from_rgbdimages(rgbd)
    n = int(pc.num_points_per_pointcloud[0])
    pts = np.asarray(pc.points_padded[0, :n])[::13]
    nrm = np.asarray(pc.normals_padded[0, :n])[::13]
    return pts, nrm


@pytest.mark.parametrize(
    "provider_cls", [ICPOdometryProvider, GradICPOdometryProvider]
)
class TestICPProviders:
    def test_provide_recovers_transform(self, msrd_data, provider_cls):
        pts, nrm = _clouds(msrd_data)
        xi = jnp.asarray([0.01, -0.01, 0.02, 0.05, -0.04, 0.03], jnp.float32)
        T_true = np.asarray(se3_exp(xi))
        tgt_pts = pts @ T_true[:3, :3].T + T_true[:3, 3]
        tgt_nrm = nrm @ T_true[:3, :3].T

        maps_pc = Pointclouds(points=[tgt_pts], normals=[tgt_nrm])
        frames_pc = Pointclouds(points=[pts], normals=[nrm])
        T = provider_cls(numiters=20, dist_thresh=0.2).provide(
            maps_pc, frames_pc
        )
        assert T.shape == (1, 1, 4, 4)
        np.testing.assert_allclose(np.asarray(T[0, 0]), T_true, atol=5e-3)

    def test_requires_normals(self, msrd_data, provider_cls):
        pts, _ = _clouds(msrd_data)
        no_normals = Pointclouds(points=[pts])
        with_pts = Pointclouds(points=[pts])
        with pytest.raises(ValueError):
            provider_cls().provide(no_normals, with_pts)

    def test_batch_size_mismatch(self, msrd_data, provider_cls):
        pts, nrm = _clouds(msrd_data)
        a = Pointclouds(points=[pts], normals=[nrm])
        b = Pointclouds(points=[pts, pts], normals=[nrm, nrm])
        with pytest.raises(ValueError):
            provider_cls().provide(a, b)
