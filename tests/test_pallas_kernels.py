"""Pallas kernel parity tests (interpret mode, runs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attentive_dfprior_tpu.models.decoders import (
    init_mlp_decoder,
    mlp_decoder_forward,
)
from attentive_dfprior_tpu.ops.pallas.decoder_kernel import (
    fused_mlp_forward,
    pack_mlp_params,
)


@pytest.mark.parametrize("color,c_dim", [(False, 32), (True, 32), (False, 64)])
def test_fused_mlp_matches_reference(color, c_dim):
    params = init_mlp_decoder(jax.random.PRNGKey(0), c_dim=c_dim, color=color)
    rng = np.random.default_rng(0)
    n = 700  # not a block multiple -> exercises padding
    p = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((n, c_dim)).astype(np.float32))

    ref = mlp_decoder_forward(params, p, c)
    if ref.ndim == 1:
        ref = ref[:, None]
    out = fused_mlp_forward(pack_mlp_params(params), p, c, block=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("stage", ["low", "high", "color"])
def test_df_forward_fused_parity(stage):
    """The fused=True eval path (used by meshing/visualization on TPU) must
    match the plain XLA df_forward at every stage."""
    from attentive_dfprior_tpu.models.decoders import df_forward, init_df_decoders

    key = jax.random.PRNGKey(2)
    params = dict(init_df_decoders(key))
    rng = np.random.default_rng(2)
    params["grid_low"] = jnp.asarray(
        rng.standard_normal((6, 5, 4, 32)).astype(np.float32) * 0.01
    )
    params["grid_high"] = jnp.asarray(
        rng.standard_normal((10, 9, 8, 32)).astype(np.float32) * 1e-4
    )
    params["grid_color"] = jnp.asarray(
        rng.standard_normal((10, 9, 8, 32)).astype(np.float32) * 0.01
    )
    bound = jnp.asarray([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]], jnp.float32)
    tsdf = jnp.asarray(
        np.clip(rng.standard_normal((12, 12, 12)), -1, 1).astype(np.float32)
    )
    p = jnp.asarray(rng.uniform(-0.9, 0.9, (300, 3)).astype(np.float32))

    raw_ref, w_ref = df_forward(params, p, params, tsdf, bound, bound, stage)
    raw_fused, w_fused = df_forward(
        params, p, params, tsdf, bound, bound, stage, fused=True
    )
    np.testing.assert_allclose(
        np.asarray(raw_fused), np.asarray(raw_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(w_fused), np.asarray(w_ref), rtol=1e-4, atol=1e-5
    )


def test_fused_mlp_block_sizes():
    params = init_mlp_decoder(jax.random.PRNGKey(1), c_dim=32, color=True)
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.standard_normal((130, 3)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((130, 32)).astype(np.float32))
    packed = pack_mlp_params(params)
    a = fused_mlp_forward(packed, p, c, block=128, interpret=True)
    b = fused_mlp_forward(packed, p, c, block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


class TestCellStencilPallas:
    """Transpose-free Pallas stencil VJP (ops/pallas/stencil_kernel.py):
    grid + point gradients must match the autodiff transpose of
    trilinear_sample exactly (the stencil is reassociation-free adds)."""

    def test_vjp_matches_autodiff(self):
        from attentive_dfprior_tpu.ops.grid_sample import (
            trilinear_sample,
            trilinear_sample_psc,
        )

        rng = np.random.default_rng(11)
        shape = (7, 5, 6, 32)
        grid = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        # include border-clamped points (|p| > 1)
        pn = jnp.asarray(rng.uniform(-1.15, 1.15, (257, 3)).astype(np.float32))
        ct = jnp.asarray(rng.normal(size=(257, 32)).astype(np.float32))

        out_ref, vjp_ref = jax.vjp(trilinear_sample, grid, pn)
        g_ref, p_ref = vjp_ref(ct)
        out_psc, vjp_psc = jax.vjp(trilinear_sample_psc, grid, pn)
        g_psc, p_psc = vjp_psc(ct)

        np.testing.assert_allclose(np.asarray(out_psc), np.asarray(out_ref))
        np.testing.assert_allclose(
            np.asarray(g_psc), np.asarray(g_ref), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(p_psc), np.asarray(p_ref), rtol=1e-5, atol=1e-5
        )

    def test_stencil_matches_cellstencil_production_vjp(self):
        from attentive_dfprior_tpu.ops.grid_sample import (
            trilinear_sample_cs,
            trilinear_sample_psc,
        )

        rng = np.random.default_rng(12)
        shape = (4, 6, 5, 32)
        grid = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        pn = jnp.asarray(rng.uniform(-1, 1, (129, 3)).astype(np.float32))
        ct = jnp.asarray(rng.normal(size=(129, 32)).astype(np.float32))

        _, vjp_cs = jax.vjp(trilinear_sample_cs, grid, pn)
        _, vjp_psc = jax.vjp(trilinear_sample_psc, grid, pn)
        g_cs, _ = vjp_cs(ct)
        g_psc, _ = vjp_psc(ct)
        np.testing.assert_allclose(
            np.asarray(g_psc), np.asarray(g_cs), rtol=1e-5, atol=1e-6
        )
