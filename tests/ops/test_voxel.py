"""Voxel-grid merge: exactness against a numpy oracle, edge cases."""

import jax.numpy as jnp
import numpy as np

from gradslam_tpu.ops.voxel import voxel_merge, voxel_merge_rows
from gradslam_tpu.structures.maparena import pack_rows


def _numpy_voxel_oracle(pts, nrm, col, cc, live, voxel):
    """Dict-based reference merge (ccount-weighted, normals renormalized)."""
    cells = {}
    for i in range(len(pts)):
        if not live[i]:
            continue
        key = tuple(np.floor(pts[i] / voxel).astype(np.int64))
        p, n, c, w = cells.get(key, (0.0, 0.0, 0.0, 0.0))
        cells[key] = (
            p + cc[i, 0] * pts[i],
            n + cc[i, 0] * nrm[i],
            c + cc[i, 0] * col[i],
            w + cc[i, 0],
        )
    out = []
    for p, n, c, w in cells.values():
        n = n / w
        nn = np.linalg.norm(n)
        out.append((p / w, n / nn if nn > 0 else n, c / w, w))
    return out


class TestVoxelMerge:
    def test_matches_numpy_oracle(self):
        rng = np.random.RandomState(0)
        N = 257
        pts = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
        nrm = rng.randn(N, 3).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        col = rng.uniform(0, 1, (N, 3)).astype(np.float32)
        cc = rng.uniform(0.1, 2.0, (N, 1)).astype(np.float32)
        live = rng.rand(N) > 0.2
        voxel = 0.25

        mp, mn, mc, mcc, mlive = voxel_merge(
            jnp.asarray(pts)[None],
            jnp.asarray(nrm)[None],
            jnp.asarray(col)[None],
            jnp.asarray(cc)[None],
            jnp.asarray(live)[None],
            voxel,
        )
        got_n = int(np.sum(np.asarray(mlive[0])))
        oracle = _numpy_voxel_oracle(pts, nrm, col, cc, live, voxel)
        assert got_n == len(oracle)

        # compare as sorted sets of merged points (order-independent)
        got = np.asarray(mp[0][:got_n])
        want = np.array([o[0] for o in oracle])
        gi = np.lexsort(got.T)
        wi = np.lexsort(want.T)
        np.testing.assert_allclose(got[gi], want[wi], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mcc[0][:got_n, 0])[gi],
            np.array([o[3] for o in oracle])[wi],
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(mn[0][:got_n])[gi],
            np.array([o[1] for o in oracle])[wi],
            atol=1e-4,
        )

    def test_distinct_points_pass_through(self):
        # widely separated points: merge is identity up to reordering
        pts = np.array([[0.0, 0, 0], [5, 0, 0], [0, 5, 0]], np.float32)
        nrm = np.tile([0, 0, 1.0], (3, 1)).astype(np.float32)
        col = np.eye(3, dtype=np.float32)
        cc = np.ones((3, 1), np.float32)
        live = np.ones(3, bool)
        mp, mn, mc, mcc, mlive = voxel_merge(
            *(jnp.asarray(a)[None] for a in (pts, nrm, col, cc, live)), 0.1
        )
        assert int(mlive[0].sum()) == 3
        got = np.asarray(mp[0][:3])
        np.testing.assert_allclose(
            got[np.lexsort(got.T)], pts[np.lexsort(pts.T)], atol=0
        )

    def test_duplicates_collapse_weighted(self):
        # two points in the same cell with ccounts 1 and 3 -> weighted mean
        pts = np.array([[0.01, 0.01, 0.01], [0.02, 0.02, 0.02]], np.float32)
        cc = np.array([[1.0], [3.0]], np.float32)
        nrm = np.tile([0, 0, 1.0], (2, 1)).astype(np.float32)
        col = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
        live = np.ones(2, bool)
        mp, mn, mc, mcc, mlive = voxel_merge(
            *(jnp.asarray(a)[None] for a in (pts, nrm, col, cc, live)), 0.1
        )
        assert int(mlive[0].sum()) == 1
        np.testing.assert_allclose(
            np.asarray(mp[0][0]), (pts[0] + 3 * pts[1]) / 4, atol=1e-7
        )
        np.testing.assert_allclose(np.asarray(mcc[0][0, 0]), 4.0)
        np.testing.assert_allclose(
            np.asarray(mc[0][0]), [0.25, 0.75, 0.0], atol=1e-7
        )

    def test_all_dead(self):
        pts = np.zeros((4, 3), np.float32)
        z = jnp.zeros
        mp, mn, mc, mcc, mlive = voxel_merge(
            jnp.asarray(pts)[None],
            z((1, 4, 3)),
            z((1, 4, 3)),
            z((1, 4, 1)),
            z((1, 4), bool),
            0.1,
        )
        assert int(mlive.sum()) == 0
        assert float(jnp.abs(mp).sum()) == 0.0

    def test_negative_coords_cell_boundaries(self):
        # floor-based cells: -0.05 and +0.05 are in DIFFERENT 0.1-cells
        pts = np.array([[-0.05, 0, 0], [0.05, 0, 0]], np.float32)
        cc = np.ones((2, 1), np.float32)
        nrm = np.tile([0, 0, 1.0], (2, 1)).astype(np.float32)
        col = np.zeros((2, 3), np.float32)
        live = np.ones(2, bool)
        _, _, _, _, mlive = voxel_merge(
            *(jnp.asarray(a)[None] for a in (pts, nrm, col, cc, live)), 0.1
        )
        assert int(mlive[0].sum()) == 2

    def test_batched_rows_jit(self):
        import jax

        rng = np.random.RandomState(1)
        B, N = 3, 64
        rows = pack_rows(
            jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)),
            jnp.ones((B, N, 3)),
            jnp.zeros((B, N, 3)),
            jnp.ones((B, N, 1)),
        )
        live = jnp.asarray(rng.rand(B, N) > 0.5)
        f = jax.jit(lambda r, l: voxel_merge_rows(r, l, 0.5))
        merged, mlive = f(rows, live)
        assert merged.shape == rows.shape
        # zeros in non-live rows
        assert float(jnp.abs(jnp.where(mlive[..., None], 0.0, merged)).sum()) == 0.0
