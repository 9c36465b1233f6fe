"""Custom-VJP trilinear sampling: the optimized sorted-scatter gradient must
match autodiff of the reference implementation exactly."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from attentive_dfprior_tpu.ops.grid_sample import (
    _corner_indices_weights,
    _segmented_unique_scatter,
    normalize_3d_coordinate,
    trilinear_sample,
    trilinear_sample_opt,
)


def test_forward_identical():
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.standard_normal((6, 7, 8, 4)).astype(np.float32))
    p = jnp.asarray(rng.uniform(-1.2, 1.2, (200, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(trilinear_sample_opt(grid, p)),
        np.asarray(trilinear_sample(grid, p)),
        rtol=1e-6,
    )


def test_grid_and_point_gradients_match_autodiff():
    rng = np.random.default_rng(1)
    grid = jnp.asarray(rng.standard_normal((5, 6, 7, 3)).astype(np.float32))
    p = jnp.asarray(rng.uniform(-0.9, 0.9, (150, 3)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((150, 3)).astype(np.float32))

    def loss_ref(g, pp):
        return jnp.sum(trilinear_sample(g, pp) * cot)

    def loss_opt(g, pp):
        return jnp.sum(trilinear_sample_opt(g, pp) * cot)

    g_ref, p_ref = jax.grad(loss_ref, argnums=(0, 1))(grid, p)
    g_opt, p_opt = jax.grad(loss_opt, argnums=(0, 1))(grid, p)
    np.testing.assert_allclose(np.asarray(g_opt), np.asarray(g_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_opt), np.asarray(p_ref), rtol=1e-4, atol=1e-5)


def test_gradients_with_duplicate_heavy_points():
    """Many points in the same cell (the ray-sample coherence case)."""
    rng = np.random.default_rng(2)
    grid = jnp.asarray(rng.standard_normal((4, 4, 4, 2)).astype(np.float32))
    # cluster all points into one cell
    p = jnp.asarray(
        (rng.uniform(0.1, 0.15, (300, 3))).astype(np.float32)
    )
    cot = jnp.asarray(rng.standard_normal((300, 2)).astype(np.float32))

    g_ref = jax.grad(lambda g: jnp.sum(trilinear_sample(g, p) * cot))(grid)
    g_opt = jax.grad(lambda g: jnp.sum(trilinear_sample_opt(g, p) * cot))(grid)
    np.testing.assert_allclose(np.asarray(g_opt), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_segmented_unique_scatter_vs_naive():
    rng = np.random.default_rng(3)
    M, C, R = 1000, 8, 50
    ids = jnp.asarray(rng.integers(0, R, M), jnp.int32)
    vals = jnp.asarray(rng.standard_normal((M, C)).astype(np.float32))
    ref = jnp.zeros((R, C)).at[ids].add(vals)
    out = _segmented_unique_scatter(ids, vals, R)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_corner_indices_weights_partition_of_unity():
    rng = np.random.default_rng(4)
    p = jnp.asarray(rng.uniform(-1, 1, (100, 3)).astype(np.float32))
    ids, w = _corner_indices_weights((5, 6, 7, 1), p)
    assert ids.shape == (100, 8) and w.shape == (100, 8)
    np.testing.assert_allclose(np.asarray(w).sum(1), 1.0, atol=1e-5)
    assert (np.asarray(ids) >= 0).all() and (np.asarray(ids) < 5 * 6 * 7).all()


def _variant(name):
    from attentive_dfprior_tpu.ops import grid_sample as gs

    return {
        "cs": gs.trilinear_sample_cs,
        "bitfold": gs.trilinear_sample_bf,
        "halo": gs.trilinear_sample_halo,
    }[name]


@pytest.mark.parametrize("variant", ["cs", "bitfold", "halo"])
class TestCustomVJPVariants:
    """Every custom-VJP sampler variant (round-4 cell-scatter+stencil, the
    round-5 XLA bit-fold production default, and the round-5 Pallas
    halo-fold) must match autodiff of the reference implementation,
    including border-clamped points where i1 collapses onto i0."""

    def _check(self, variant, shape, p, seed=0):
        sampler = _variant(variant)
        rng = np.random.default_rng(seed)
        grid = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        cot = jnp.asarray(
            rng.standard_normal((p.shape[0], shape[-1])).astype(np.float32)
        )

        def loss_ref(g, pp):
            return jnp.sum(trilinear_sample(g, pp) * cot)

        def loss_v(g, pp):
            return jnp.sum(sampler(g, pp) * cot)

        g_ref, p_ref = jax.grad(loss_ref, argnums=(0, 1))(grid, p)
        g_v, p_v = jax.grad(loss_v, argnums=(0, 1))(grid, p)
        np.testing.assert_allclose(
            np.asarray(g_v), np.asarray(g_ref), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(p_v), np.asarray(p_ref), rtol=1e-4, atol=1e-5
        )

    def test_forward_identical(self, variant):
        sampler = _variant(variant)
        rng = np.random.default_rng(3)
        grid = jnp.asarray(rng.standard_normal((6, 7, 8, 4)).astype(np.float32))
        p = jnp.asarray(rng.uniform(-1.2, 1.2, (200, 3)).astype(np.float32))
        # the z-pair forward (bitfold/halo) is bit-identical by
        # construction (same ops, same association) — assert exactly
        np.testing.assert_array_equal(
            np.asarray(sampler(grid, p)),
            np.asarray(trilinear_sample(grid, p)),
        )

    def test_interior_points(self, variant):
        rng = np.random.default_rng(4)
        p = jnp.asarray(rng.uniform(-0.9, 0.9, (150, 3)).astype(np.float32))
        self._check(variant, (5, 6, 7, 3), p, seed=4)

    def test_border_and_out_of_bound_points(self, variant):
        """Clamped points exercise the collapsed-corner (f=0) case that the
        stencil's zero-padding must reproduce."""
        rng = np.random.default_rng(5)
        p = jnp.asarray(
            np.concatenate([
                rng.uniform(-1.6, 1.6, (120, 3)),
                np.array([[1.0, 1.0, 1.0], [-1.0, -1.0, -1.0],
                          [1.0, -1.0, 1.0]]),
            ]).astype(np.float32)
        )
        self._check(variant, (6, 5, 4, 2), p, seed=5)

    def test_duplicate_heavy_cluster(self, variant):
        rng = np.random.default_rng(6)
        p = jnp.asarray(
            (0.1 + 0.01 * rng.uniform(-1, 1, (300, 3))).astype(np.float32)
        )
        self._check(variant, (4, 4, 4, 2), p, seed=6)


def test_default_impl_is_known():
    """DFPRIOR_TRILINEAR_VJP must name a known sampler impl (production
    default is =halo, the Pallas halo-fold; =bitfold is the pure-XLA
    fallback — kept in sync with the README env-switch table)."""
    import os

    assert os.environ.get("DFPRIOR_TRILINEAR_VJP", "bitfold") in (
        "bitfold", "halo", "cellstencil", "xla", "sorted", "pallas",
    )


def test_zpair_forward_bit_identical_on_non_channel_last_sizes():
    """Odd C (not 32) and tiny nz exercise the z-pair build's last-plane
    repeat and the clamp argument that its value is never read."""
    from attentive_dfprior_tpu.ops.grid_sample import trilinear_sample_zpair

    rng = np.random.default_rng(7)
    for shape in [(4, 5, 2, 3), (3, 3, 3, 1), (6, 2, 9, 5)]:
        grid = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        p = jnp.asarray(rng.uniform(-1.3, 1.3, (100, 3)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(trilinear_sample_zpair(grid, p)),
            np.asarray(trilinear_sample(grid, p)),
        )


class TestFusedPairSample:
    """trilinear_sample_pair: the fused high+color grid VJP (one doubled-
    width cell scatter + fold) must match two independent samples in value
    and in every gradient, for both fold impls and on border points.

    Reference counterpart: the two independent cuDNN grid_sample backwards
    of ref src/conv_onet/models/decoder.py:168-175 (fine + color decoders).
    """

    def _check(self, impl, monkeypatch, shape=(7, 6, 5, 4), n=250, seed=0):
        import os
        from attentive_dfprior_tpu.ops.grid_sample import (
            sample_feature_grid_pair,
        )

        monkeypatch.setenv("DFPRIOR_TRILINEAR_VJP", impl)
        rng = np.random.default_rng(seed)
        ga = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        gb = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        bound = jnp.asarray(
            np.array([[-2.0, 3.0], [-1.0, 1.0], [0.0, 4.0]], np.float32)
        )
        lo, hi = np.asarray(bound)[:, 0], np.asarray(bound)[:, 1]
        # include out-of-bound points (border clamp)
        p = jnp.asarray(
            (lo + rng.uniform(-0.2, 1.2, (n, 3)) * (hi - lo)).astype(
                np.float32
            )
        )

        def loss_pair(ga, gb, p):
            a, b = sample_feature_grid_pair(ga, gb, p, bound)
            return jnp.sum(jnp.sin(a)) + jnp.sum(b * b)

        def loss_ref(ga, gb, p):
            a = trilinear_sample(ga, normalize_3d_coordinate(p, bound))
            b = trilinear_sample(gb, normalize_3d_coordinate(p, bound))
            return jnp.sum(jnp.sin(a)) + jnp.sum(b * b)

        va, vb = sample_feature_grid_pair(ga, gb, p, bound)
        ra = trilinear_sample(ga, normalize_3d_coordinate(p, bound))
        rb = trilinear_sample(gb, normalize_3d_coordinate(p, bound))
        np.testing.assert_allclose(np.asarray(va), np.asarray(ra), atol=1e-6)
        np.testing.assert_allclose(np.asarray(vb), np.asarray(rb), atol=1e-6)

        g1 = jax.grad(loss_pair, argnums=(0, 1, 2))(ga, gb, p)
        g0 = jax.grad(loss_ref, argnums=(0, 1, 2))(ga, gb, p)
        for got, want in zip(g1, g0):
            scale = float(jnp.abs(want).max()) + 1e-8
            np.testing.assert_allclose(
                np.asarray(got) / scale, np.asarray(want) / scale, atol=3e-6
            )

    def test_halo(self, monkeypatch):
        self._check("halo", monkeypatch)

    def test_bitfold(self, monkeypatch):
        self._check("bitfold", monkeypatch, seed=1)

    def test_shape_mismatch_falls_back(self, monkeypatch):
        from attentive_dfprior_tpu.ops.grid_sample import (
            sample_feature_grid_pair,
        )

        monkeypatch.setenv("DFPRIOR_TRILINEAR_VJP", "halo")
        rng = np.random.default_rng(2)
        ga = jnp.asarray(rng.standard_normal((5, 4, 3, 2)).astype(np.float32))
        gb = jnp.asarray(rng.standard_normal((7, 4, 3, 2)).astype(np.float32))
        bound = jnp.asarray(np.array([[-1, 1], [-1, 1], [-1, 1]], np.float32))
        p = jnp.asarray(rng.uniform(-1, 1, (50, 3)).astype(np.float32))
        a, b = sample_feature_grid_pair(ga, gb, p, bound)
        assert a.shape == (50, 2) and b.shape == (50, 2)
