"""Decoder forward parity vs an independent torch implementation of the
reference MLP equations (ref: src/conv_onet/models/decoder.py:91-258).

We build a torch model with the reference architecture, copy its weights into
our pytree layout, and require allclose outputs — the north-star numeric
parity requirement for the scene model.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from attentive_dfprior_tpu.models.decoders import (
    init_df_decoders,
    init_mlp_decoder,
    init_mlp_tsdf,
    mlp_decoder_forward,
    mlp_tsdf_forward,
    df_forward,
    tsdf_to_inv_occupancy,
)
from attentive_dfprior_tpu.ops.grid_sample import sample_feature_grid

HIDDEN = 32
EMBED = 93


class TorchRefMLP(nn.Module):
    """Reference decoder MLP architecture (decoder.py:91-203), torch."""

    def __init__(self, c_dim=32, color=False, n_blocks=5, skips=(2,)):
        super().__init__()
        self.skips = skips
        self.color = color
        self.B = nn.Parameter(torch.randn(3, EMBED) * 25)
        self.fc_c = nn.ModuleList([nn.Linear(c_dim, HIDDEN) for _ in range(n_blocks)])
        layers = [nn.Linear(EMBED, HIDDEN)]
        for i in range(n_blocks - 1):
            fan_in = HIDDEN + EMBED if i in skips else HIDDEN
            layers.append(nn.Linear(fan_in, HIDDEN))
        self.pts_linears = nn.ModuleList(layers)
        self.output_linear = nn.Linear(HIDDEN, 4 if color else 1)

    def forward(self, p, c):
        e = torch.sin(p @ self.B)
        h = e
        for i, l in enumerate(self.pts_linears):
            h = F.relu(l(h))
            h = h + self.fc_c[i](c)
            if i in self.skips:
                h = torch.cat([e, h], -1)
        out = self.output_linear(h)
        if not self.color:
            out = out.squeeze(-1)
        return out


def copy_torch_mlp_to_pytree(tm: TorchRefMLP, params):
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["B"] = jnp.asarray(tm.B.detach().numpy())
    for i, l in enumerate(tm.pts_linears):
        params["pts"][i] = {
            "w": jnp.asarray(l.weight.detach().numpy().T),
            "b": jnp.asarray(l.bias.detach().numpy()),
        }
    for i, l in enumerate(tm.fc_c):
        params["fc_c"][i] = {
            "w": jnp.asarray(l.weight.detach().numpy().T),
            "b": jnp.asarray(l.bias.detach().numpy()),
        }
    params["out"] = {
        "w": jnp.asarray(tm.output_linear.weight.detach().numpy().T),
        "b": jnp.asarray(tm.output_linear.bias.detach().numpy()),
    }
    return params


@pytest.mark.parametrize("color,c_dim", [(False, 32), (True, 32), (False, 64)])
def test_mlp_decoder_parity(color, c_dim):
    torch.manual_seed(0)
    tm = TorchRefMLP(c_dim=c_dim, color=color)
    params = init_mlp_decoder(jax.random.PRNGKey(0), c_dim=c_dim, color=color)
    params = copy_torch_mlp_to_pytree(tm, params)

    rng = np.random.default_rng(0)
    p = rng.standard_normal((123, 3)).astype(np.float32)
    c = rng.standard_normal((123, c_dim)).astype(np.float32)

    ref = tm(torch.from_numpy(p), torch.from_numpy(c)).detach().numpy()
    ours = np.asarray(mlp_decoder_forward(params, jnp.asarray(p), jnp.asarray(c)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TorchRefMlpTsdf(nn.Module):
    """Reference attention MLP (decoder.py:206-258), torch."""

    def __init__(self):
        super().__init__()
        dims = [2, 64, 128, 128, 64]
        self.pts_linears = nn.ModuleList(
            [nn.Linear(dims[i], dims[i + 1]) for i in range(4)]
        )
        self.output_linear = nn.Linear(64, 2)

    def forward(self, occ, inv_tsdf):
        x = torch.stack([occ, inv_tsdf], dim=0).t()
        h = x
        for l in self.pts_linears:
            h = F.relu(l(h))
        w = torch.softmax(self.output_linear(h), dim=1)
        out = (w * x).sum(dim=1)
        return out, w[:, 1]


def test_mlp_tsdf_parity():
    torch.manual_seed(1)
    tm = TorchRefMlpTsdf()
    params = init_mlp_tsdf(jax.random.PRNGKey(1))
    for i, l in enumerate(tm.pts_linears):
        params["layers"][i] = {
            "w": jnp.asarray(l.weight.detach().numpy().T),
            "b": jnp.asarray(l.bias.detach().numpy()),
        }
    params["out"] = {
        "w": jnp.asarray(tm.output_linear.weight.detach().numpy().T),
        "b": jnp.asarray(tm.output_linear.bias.detach().numpy()),
    }

    rng = np.random.default_rng(2)
    occ = rng.standard_normal(200).astype(np.float32)
    inv = rng.standard_normal(200).astype(np.float32)

    ref_out, ref_w = tm(torch.from_numpy(occ), torch.from_numpy(inv))
    out, w = mlp_tsdf_forward(params, jnp.asarray(occ), jnp.asarray(inv))
    np.testing.assert_allclose(np.asarray(out), ref_out.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), ref_w.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_tsdf_inversion_formula():
    """inv_tsdf = clamp(-0.1*log(1/(clamp(1-(t+1)/2,0,1)+1e-8)-1+1e-7), ±100)
    (ref: decoder.py:244-248)."""
    t = np.array([-1.0, -0.5, 0.0, 0.5, 1.0, -0.99999, 0.99999], np.float32)
    tt = torch.from_numpy(t)
    occ_t = torch.clamp(1.0 - (tt + 1.0) / 2.0, 0.0, 1.0)
    ref = torch.clamp(-0.1 * torch.log(1 / (occ_t + 1e-8) - 1 + 1e-7), -100.0, 100.0)
    ours = np.asarray(tsdf_to_inv_occupancy(jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_df_forward_stages_shapes_and_semantics():
    """Stage dispatch: low -> w==1, raw rgb zeros; high/color blend only where
    TSDF is non-saturated (ref: decoder.py:307-353)."""
    key = jax.random.PRNGKey(3)
    params = init_df_decoders(key, c_dim=8)
    rng = np.random.default_rng(3)
    shapes = dict(grid_low=(4, 4, 4, 8), grid_high=(8, 8, 8, 8), grid_color=(8, 8, 8, 8))
    for k, s in shapes.items():
        params[k] = jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.01)

    bound = jnp.asarray(np.array([[0, 1], [0, 1], [0, 1]], np.float32))
    tsdf_bnds = bound
    # half the volume saturated at -1, half mid-range
    tsdf = np.full((6, 6, 6), -1.0, np.float32)
    tsdf[3:] = 0.3
    tsdf = jnp.asarray(tsdf)

    p = jnp.asarray(rng.uniform(0.05, 0.95, (50, 3)).astype(np.float32))

    raw_low, w_low = df_forward(params, p, params, tsdf, tsdf_bnds, bound, "low")
    assert raw_low.shape == (50, 4) and w_low.shape == (50,)
    np.testing.assert_allclose(np.asarray(w_low), 1.0)
    np.testing.assert_allclose(np.asarray(raw_low[:, :3]), 0.0)

    raw_high, w_high = df_forward(params, p, params, tsdf, tsdf_bnds, bound, "high")
    # saturated-TSDF points must keep w == 1
    from attentive_dfprior_tpu.models.decoders import sample_tsdf

    tv = np.asarray(sample_tsdf(tsdf, p, tsdf_bnds))
    sat = ~((tv > -1 + 1e-4) & (tv < 1 - 1e-4))
    np.testing.assert_allclose(np.asarray(w_high)[sat], 1.0)
    # saturated points fall back to the low-decoder occupancy
    np.testing.assert_allclose(
        np.asarray(raw_high[:, 3])[sat], np.asarray(raw_low[:, 3])[sat], rtol=1e-5, atol=1e-6
    )

    raw_color, w_color = df_forward(params, p, params, tsdf, tsdf_bnds, bound, "color")
    np.testing.assert_allclose(np.asarray(raw_color[:, 3]), np.asarray(raw_high[:, 3]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_color), np.asarray(w_high), rtol=1e-5, atol=1e-6)
    assert np.abs(np.asarray(raw_color[:, :3])).sum() > 0
