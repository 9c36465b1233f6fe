"""Trilinear sampling parity vs torch F.grid_sample (the reference's op).

The reference samples features via F.grid_sample(padding_mode='border',
align_corners=True) on grids stored [1, C, NZ, NY, NX] (x/z swapped); our
grids are channels-last (NX, NY, NZ, C). These tests prove the two agree to
float32 round-off, including out-of-bound (border-clamped) points.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from attentive_dfprior_tpu.ops.grid_sample import (
    normalize_3d_coordinate,
    sample_feature_grid,
    trilinear_sample,
)


def torch_reference_sample(grid_xyz_c: np.ndarray, p: np.ndarray, bound: np.ndarray):
    """The reference pipeline: normalize, swap to [1,C,NZ,NY,NX], grid_sample."""
    nx, ny, nz, C = grid_xyz_c.shape
    g = torch.from_numpy(grid_xyz_c).permute(3, 2, 1, 0)[None]  # [1,C,NZ,NY,NX]
    pn = p.copy()
    for a in range(3):
        pn[:, a] = (pn[:, a] - bound[a, 0]) / (bound[a, 1] - bound[a, 0]) * 2 - 1
    vgrid = torch.from_numpy(pn)[None, :, None, None, :].float()  # [1,N,1,1,3]
    out = F.grid_sample(
        g, vgrid, padding_mode="border", align_corners=True, mode="bilinear"
    )
    return out[0, :, :, 0, 0].T.numpy()  # (N, C)


@pytest.mark.parametrize("shape", [(5, 7, 9, 4), (2, 2, 2, 1), (16, 12, 8, 32)])
def test_trilinear_matches_torch_grid_sample(shape):
    rng = np.random.default_rng(0)
    grid = rng.standard_normal(shape).astype(np.float32)
    bound = np.array([[-2.0, 3.0], [-1.0, 2.0], [0.0, 4.0]], dtype=np.float32)
    n = 257
    # points inside and far outside the bound (exercises border clamping)
    p = rng.uniform(-4, 6, size=(n, 3)).astype(np.float32)

    ours = np.asarray(sample_feature_grid(grid, p, bound))
    theirs = torch_reference_sample(grid, p, bound)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_exact_grid_points():
    """Sampling exactly at voxel centers returns the stored values."""
    rng = np.random.default_rng(1)
    nx, ny, nz, C = 4, 5, 6, 3
    grid = rng.standard_normal((nx, ny, nz, C)).astype(np.float32)
    bound = np.array([[0, 1], [0, 1], [0, 1]], dtype=np.float32)
    xs = np.linspace(0, 1, nx)
    ys = np.linspace(0, 1, ny)
    zs = np.linspace(0, 1, nz)
    pts, vals = [], []
    for i, x in enumerate(xs):
        for j, y in enumerate(ys):
            for k, z in enumerate(zs):
                pts.append([x, y, z])
                vals.append(grid[i, j, k])
    out = np.asarray(sample_feature_grid(grid, np.array(pts, np.float32), bound))
    np.testing.assert_allclose(out, np.array(vals), rtol=1e-5, atol=1e-5)


def test_normalize_3d_coordinate():
    bound = np.array([[-1.0, 3.0], [0.0, 2.0], [5.0, 9.0]], dtype=np.float32)
    p = np.array([[-1.0, 0.0, 5.0], [3.0, 2.0, 9.0], [1.0, 1.0, 7.0]], np.float32)
    out = np.asarray(normalize_3d_coordinate(p, bound))
    np.testing.assert_allclose(
        out, [[-1, -1, -1], [1, 1, 1], [0, 0, 0]], atol=1e-6
    )


def test_gradients_flow_through_grid():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    grid = jnp.asarray(rng.standard_normal((4, 4, 4, 2)).astype(np.float32))
    bound = jnp.asarray(np.array([[0, 1]] * 3, np.float32))
    p = jnp.asarray(rng.uniform(0, 1, (10, 3)).astype(np.float32))

    g = jax.grad(lambda gr: jnp.sum(sample_feature_grid(gr, p, bound)))(grid)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


class TestTSDFRows:
    """Wide Z-row TSDF layout (the production prior-sampling fast path,
    6.6x faster on TPU — scripts/bench_tsdf_gather.py) must match the dense
    (X, Y, Z) path in values AND point-gradients, including border clamps."""

    def _setup(self, shape=(9, 7, 5), seed=3):
        import jax.numpy as jnp

        from attentive_dfprior_tpu.ops.grid_sample import tsdf_to_rows

        rng = np.random.default_rng(seed)
        vol = rng.uniform(-1, 1, shape).astype(np.float32)
        bound = np.array([[-2.0, 3.0], [-1.0, 2.0], [0.0, 4.0]], np.float32)
        # interior, boundary, and out-of-bound (border-clamped) points
        p = np.concatenate([
            rng.uniform(-2, 3, (101, 3)),
            rng.uniform(-4, 6, (50, 3)),
            bound.T.copy(),
        ]).astype(np.float32)
        p[:, 1] = np.clip(p[:, 1], -2.5, 3.5)
        p[:, 2] = np.clip(p[:, 2], -1.0, 5.0)
        return jnp.asarray(vol), tsdf_to_rows(vol), jnp.asarray(bound), jnp.asarray(p)

    def test_values_match_dense(self):
        from attentive_dfprior_tpu.models.decoders import sample_tsdf

        vol, rows, bound, p = self._setup()
        dense = np.asarray(sample_tsdf(vol, p, bound))
        wide = np.asarray(sample_tsdf(rows, p, bound))
        np.testing.assert_allclose(wide, dense, rtol=1e-5, atol=1e-5)

    def test_point_gradients_match_dense(self):
        import jax
        import jax.numpy as jnp

        from attentive_dfprior_tpu.models.decoders import sample_tsdf

        vol, rows, bound, p = self._setup()
        g_dense = jax.grad(lambda q: jnp.sum(sample_tsdf(vol, q, bound) ** 2))(p)
        g_wide = jax.grad(lambda q: jnp.sum(sample_tsdf(rows, q, bound) ** 2))(p)
        np.testing.assert_allclose(
            np.asarray(g_wide), np.asarray(g_dense), rtol=1e-4, atol=1e-4
        )

    def test_rows_pytree_roundtrip_under_jit(self):
        import jax

        from attentive_dfprior_tpu.models.decoders import sample_tsdf

        vol, rows, bound, p = self._setup()
        jitted = jax.jit(lambda t, q: sample_tsdf(t, q, bound))
        out = np.asarray(jitted(rows, p))
        ref = np.asarray(sample_tsdf(vol, p, bound))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_non_multiple_of_128_z(self):
        from attentive_dfprior_tpu.models.decoders import sample_tsdf
        from attentive_dfprior_tpu.ops.grid_sample import tsdf_to_rows

        rng = np.random.default_rng(7)
        vol = rng.uniform(-1, 1, (4, 3, 130)).astype(np.float32)
        bound = np.array([[0, 1], [0, 1], [0, 1]], np.float32)
        p = rng.uniform(0, 1, (64, 3)).astype(np.float32)
        import jax.numpy as jnp

        dense = np.asarray(sample_tsdf(jnp.asarray(vol), jnp.asarray(p), jnp.asarray(bound)))
        wide = np.asarray(sample_tsdf(tsdf_to_rows(vol), jnp.asarray(p), jnp.asarray(bound)))
        np.testing.assert_allclose(wide, dense, rtol=1e-5, atol=1e-5)
