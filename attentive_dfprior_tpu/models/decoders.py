"""Decoder MLPs and the attentive depth-fusion module, pure-functional.

Re-implements the behavior of the reference decoders
(ref: src/conv_onet/models/decoder.py:91-353) as JAX parameter pytrees +
forward functions:

  - ``mlp_decoder_forward``: the grid-conditioned coordinate MLP (low / high /
    color decoders). 5 blocks, hidden 32, skip at block 2, per-block feature
    injection via ``fc_c`` linears, Gaussian-Fourier coordinate embedding.
  - ``mlp_tsdf_forward``: the paper's attention module — a 4-layer MLP over
    (learned occupancy, logit-inverted TSDF) pairs with a softmax producing
    blend weights (ref: decoder.py:206-258).
  - ``df_forward``: stage dispatch ('low' | 'high' | 'color') producing
    raw (N, 4) + attention weight (N,) (ref: decoder.py:307-353). Stages are
    compile-time static; the reference's boolean-mask scatter over TSDF-valid
    points is replaced by a jnp.where select — numerically identical and
    shape-static for XLA.

Weight convention: linear layers are stored as {'w': (in, out), 'b': (out,)}
and applied as ``x @ w + b`` (transpose of torch's (out, in) layout — better
for row-major batges on the MXU).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from attentive_dfprior_tpu.models.embeddings import fourier_embed, init_fourier_embedding
from attentive_dfprior_tpu.ops.grid_sample import (
    TSDFRows,
    normalize_3d_coordinate,
    sample_feature_grid,
    sample_feature_grid_pair,
    trilinear_sample_rows,
)

EMBED_SIZE = 93
HIDDEN = 32
N_BLOCKS = 5
SKIPS = (2,)


def _xavier_uniform(key: jax.Array, fan_in: int, fan_out: int, gain: float) -> jnp.ndarray:
    """torch.nn.init.xavier_uniform_ with the given gain (DenseLayer init,
    ref: decoder.py:70-79)."""
    a = gain * float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, (fan_in, fan_out), minval=-a, maxval=a)


def _dense_init(key: jax.Array, fan_in: int, fan_out: int, activation: str) -> Dict[str, jnp.ndarray]:
    gain = float(np.sqrt(2.0)) if activation == "relu" else 1.0
    return {
        "w": _xavier_uniform(key, fan_in, fan_out, gain),
        "b": jnp.zeros((fan_out,)),
    }


def _torch_linear_init(key: jax.Array, fan_in: int, fan_out: int) -> Dict[str, jnp.ndarray]:
    """torch.nn.Linear default init (kaiming-uniform a=sqrt(5) => U(±1/sqrt(in)))
    — used by the reference's plain fc_c linears."""
    k1, k2 = jax.random.split(key)
    bnd = 1.0 / float(np.sqrt(fan_in))
    return {
        "w": jax.random.uniform(k1, (fan_in, fan_out), minval=-bnd, maxval=bnd),
        "b": jax.random.uniform(k2, (fan_out,), minval=-bnd, maxval=bnd),
    }


def _linear(p: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


# ---------------------------------------------------------------------------
# Grid-conditioned coordinate MLP (low / high / color decoders)
# ---------------------------------------------------------------------------


def init_mlp_decoder(
    key: jax.Array,
    c_dim: int = 32,
    color: bool = False,
    hidden: int = HIDDEN,
    n_blocks: int = N_BLOCKS,
) -> Dict[str, Any]:
    """Initialize one decoder MLP (ref: decoder.py:110-166).

    Args:
        c_dim: injected feature dim (32 for low/color; 64 for high, which
            concatenates the low-grid feature).
        color: 4-channel output (rgb + occ) vs 1-channel occupancy.
    """
    keys = jax.random.split(key, 2 * n_blocks + 3)
    pts = [_dense_init(keys[0], EMBED_SIZE, hidden, "relu")]
    for i in range(n_blocks - 1):
        fan_in = hidden + EMBED_SIZE if i in SKIPS else hidden
        pts.append(_dense_init(keys[1 + i], fan_in, hidden, "relu"))
    fc_c = [
        _torch_linear_init(keys[n_blocks + i], c_dim, hidden) for i in range(n_blocks)
    ]
    out_dim = 4 if color else 1
    return {
        "B": init_fourier_embedding(keys[2 * n_blocks]),
        "pts": pts,
        "fc_c": fc_c,
        "out": _dense_init(keys[2 * n_blocks + 1], hidden, out_dim, "linear"),
    }


def mlp_decoder_forward(
    params: Dict[str, Any], p: jnp.ndarray, c: jnp.ndarray
) -> jnp.ndarray:
    """Decoder forward (ref: decoder.py:177-203).

    Args:
        p: (N, 3) raw world coordinates (embedded, not normalized).
        c: (N, c_dim) interpolated grid features.

    Returns:
        (N,) occupancy or (N, 4) rgb+occ depending on the output head.
    """
    e = fourier_embed(params["B"], p)
    h = e
    for i in range(len(params["pts"])):
        h = jax.nn.relu(_linear(params["pts"][i], h))
        h = h + _linear(params["fc_c"][i], c)
        if i in SKIPS:
            h = jnp.concatenate([e, h], axis=-1)
    out = _linear(params["out"], h)
    if out.shape[-1] == 1:
        out = out[..., 0]
    return out


# ---------------------------------------------------------------------------
# Attentive depth-fusion module (mlp_tsdf)
# ---------------------------------------------------------------------------

MLP_TSDF_DIMS = (2, 64, 128, 128, 64)


def init_mlp_tsdf(key: jax.Array) -> Dict[str, Any]:
    """Attention MLP: 2->64->128->128->64->2 (ref: decoder.py:212-228)."""
    keys = jax.random.split(key, len(MLP_TSDF_DIMS))
    layers = [
        _dense_init(keys[i], MLP_TSDF_DIMS[i], MLP_TSDF_DIMS[i + 1], "relu")
        for i in range(len(MLP_TSDF_DIMS) - 1)
    ]
    return {
        "layers": layers,
        "out": _dense_init(keys[-1], MLP_TSDF_DIMS[-1], 2, "linear"),
    }


def tsdf_to_inv_occupancy(tsdf_val: jnp.ndarray) -> jnp.ndarray:
    """TSDF in [-1,1] -> clamped logit of its occupancy reading.

    occ_t = clamp(1 - (tsdf+1)/2, 0, 1); inv = clamp(-0.1*log(1/(occ_t+1e-8)
    - 1 + 1e-7), ±100)  (ref: decoder.py:244-248).
    """
    t = jnp.clip(1.0 - (tsdf_val + 1.0) / 2.0, 0.0, 1.0)
    inv = -0.1 * jnp.log(1.0 / (t + 1e-8) - 1.0 + 1e-7)
    return jnp.clip(inv, -100.0, 100.0)


def mlp_tsdf_forward(
    params: Dict[str, Any], occ: jnp.ndarray, inv_tsdf: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Attention blend of learned occupancy and TSDF occupancy.

    (ref: decoder.py:240-258)

    Args:
        occ: (N,) learned occupancy (high + low decoder sum).
        inv_tsdf: (N,) logit-inverted TSDF (tsdf_to_inv_occupancy output).

    Returns:
        blended (N,), attention_weight (N,) — the TSDF-branch weight w[:, 1].
    """
    x = jnp.stack([occ, inv_tsdf], axis=-1)  # (N, 2)
    h = x
    for layer in params["layers"]:
        h = jax.nn.relu(_linear(layer, h))
    w = jax.nn.softmax(_linear(params["out"], h), axis=-1)  # (N, 2)
    blended = jnp.sum(w * x, axis=-1)
    return blended, w[:, 1]


# ---------------------------------------------------------------------------
# Full DF decoder set + stage dispatch
# ---------------------------------------------------------------------------


def init_df_decoders(key: jax.Array, c_dim: int = 32) -> Dict[str, Any]:
    """All decoder parameters as one pytree (ref: decoder.py:276-292)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "low": init_mlp_decoder(k1, c_dim=c_dim, color=False),
        "high": init_mlp_decoder(k2, c_dim=2 * c_dim, color=False),
        "color": init_mlp_decoder(k3, c_dim=c_dim, color=True),
        "mlp": init_mlp_tsdf(k4),
    }


def sample_tsdf(
    tsdf_volume, p: jnp.ndarray, tsdf_bnds: jnp.ndarray
) -> jnp.ndarray:
    """Trilinear TSDF lookup at world points (ref: decoder.py:295-303).

    Args:
        tsdf_volume: (X, Y, Z) float volume, or a TSDFRows wide-row volume
            (ops/grid_sample.py) — the production layout; 6.6x faster on
            TPU for room0-scale priors.
        p: (N, 3); tsdf_bnds: (3, 2).
    """
    if isinstance(tsdf_volume, TSDFRows):
        return trilinear_sample_rows(
            tsdf_volume, normalize_3d_coordinate(p, tsdf_bnds)
        )
    # plain-volume fallback: the z-pair wide-row gather for small/medium
    # volumes. The volume is a CONSTANT prior, so XLA hoists the
    # (nvox, 2)-row duplicate build out of the surrounding iteration scan
    # and each lookup becomes 4 wide row gathers instead of 8 single-float
    # ones — measured 13.2 -> 1.3 ms at the 196M-voxel room0 prior. But
    # the dup doubles the volume's HBM footprint (1.6 GB at room0 full
    # res), which faulted the chip when combined with a full training
    # graph — so the wide path is size-gated; big volumes should use the
    # TSDFRows production container instead.
    nvox = (
        tsdf_volume.shape[0] * tsdf_volume.shape[1] * tsdf_volume.shape[2]
    )
    if nvox <= 64_000_000:
        from attentive_dfprior_tpu.ops.grid_sample import (
            trilinear_sample_zpair,
        )

        return trilinear_sample_zpair(
            tsdf_volume[..., None], normalize_3d_coordinate(p, tsdf_bnds)
        )[:, 0]
    # Huge plain volume: keep the reference-faithful 8-corner gather.
    # Anything that materializes an extra ~1 GB inside the training scan
    # graph (a z-pair dup, or an in-graph pad+reshape to the rows layout)
    # reproducibly faults the chip regardless of the VJP implementation
    # (isolated 2026-08-21); production callers convert ONCE host-side via
    # tsdf_to_rows (slam/system.py) and get the 6.9x rows path. The one
    # additional known-bad combination — this plain gather sharing a full
    # mapping graph with the Pallas halo-fold VJP — is documented in
    # ops/pallas/halo_fold_kernel.py (workaround:
    # DFPRIOR_TRILINEAR_VJP=bitfold).
    return sample_feature_grid(tsdf_volume[..., None], p, tsdf_bnds)[:, 0]


def _decoder_eval(
    dec_params: Dict[str, Any], p: jnp.ndarray, c: jnp.ndarray, fused: bool
) -> jnp.ndarray:
    """Dispatch one decoder MLP either to the plain XLA chain or to the
    fused Pallas TPU kernel (forward-only — no VJP; use fused=True only in
    no-gradient paths like meshing and visualization renders)."""
    if not fused:
        return mlp_decoder_forward(dec_params, p, c)
    from attentive_dfprior_tpu.ops.pallas.decoder_kernel import (
        fused_mlp_forward,
        pack_mlp_params,
    )

    out = fused_mlp_forward(
        pack_mlp_params(dec_params), p, c,
        interpret=jax.default_backend() != "tpu",
    )
    if out.shape[-1] == 1:
        out = out[..., 0]
    return out


def df_forward(
    params: Dict[str, Any],
    p: jnp.ndarray,
    grids: Dict[str, jnp.ndarray],
    tsdf_volume: jnp.ndarray,
    tsdf_bnds: jnp.ndarray,
    bound: jnp.ndarray,
    stage: str = "color",
    fused: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stage-dispatched scene query (ref: decoder.py:307-353).

    Args:
        params: decoder pytree from init_df_decoders.
        p: (N, 3) world points.
        grids: {'grid_low','grid_high','grid_color'} channels-last volumes.
        tsdf_volume: (X, Y, Z); tsdf_bnds: (3, 2); bound: (3, 2) scene bound.
        stage: 'low' | 'high' | 'color' (static).
        fused: route decoder MLPs through the fused Pallas kernel
            (forward-only; for no-gradient eval paths).

    Returns:
        raw (N, 4) [rgb, occ], attention weight (N,).
    """
    n = p.shape[0]
    c_low = sample_feature_grid(grids["grid_low"], p, bound)

    low_occ = _decoder_eval(params["low"], p, c_low, fused)
    if stage == "low":
        raw = jnp.zeros((n, 4), dtype=low_occ.dtype).at[:, 3].set(low_occ)
        return raw, jnp.ones((n,), dtype=low_occ.dtype)

    # high decoder concatenates its own feature with a stop-gradient low
    # feature (ref: decoder.py:182-187). In the color stage the high and
    # color grids (same shape in every shipped config) are sampled as a
    # FUSED pair: one doubled-width cell scatter + fold in the backward
    # halves the row-serial scatter cost of the two grid VJPs
    # (ops/grid_sample.py:trilinear_sample_pair).
    c_color = None
    if stage == "color":
        c_high, c_color = sample_feature_grid_pair(
            grids["grid_high"], grids["grid_color"], p, bound
        )
    else:
        c_high = sample_feature_grid(grids["grid_high"], p, bound)
    c_high = jnp.concatenate([c_high, jax.lax.stop_gradient(c_low)], axis=-1)
    high_occ = _decoder_eval(params["high"], p, c_high, fused)
    f_add_m_occ = high_occ + low_occ

    tsdf_val = sample_tsdf(tsdf_volume, p, tsdf_bnds)
    # Only blend where the TSDF is non-saturated (ref: decoder.py:329-333).
    tsdf_mask = (tsdf_val > -1.0 + 1e-4) & (tsdf_val < 1.0 - 1e-4)
    inv_tsdf = tsdf_to_inv_occupancy(tsdf_val)
    blended, att_w = mlp_tsdf_forward(params["mlp"], f_add_m_occ, inv_tsdf)

    new_occ = jnp.where(tsdf_mask, blended, low_occ)
    w = jnp.where(tsdf_mask, att_w, jnp.ones_like(att_w))

    if stage == "high":
        raw = jnp.zeros((n, 4), dtype=new_occ.dtype).at[:, 3].set(new_occ)
        return raw, w

    # color stage (c_color pre-sampled by the fused pair above)
    rgb_occ = _decoder_eval(params["color"], p, c_color, fused)  # (N, 4)
    raw = jnp.concatenate([rgb_occ[:, :3], new_occ[:, None]], axis=-1)
    return raw, w


def load_pretrained_low_high(
    params: Dict[str, Any], ckpt_path: str
) -> Optional[Dict[str, Any]]:
    """Load the reference's pretrained ConvONet low/high decoders if present.

    The reference loads ``pretrained/low_high.pt`` and performs key-prefix
    surgery to split coarse/fine decoder weights
    (ref: src/DF_Prior.py:197-218). The blob is not shipped with the repo
    mount; when absent we return None and the caller keeps the random init
    (documented from-scratch path — the high decoder should then be left
    trainable, see SceneConfig.fix_high).

    Torch stores Linear weights (out, in); we transpose to (in, out).
    """
    import os

    if not ckpt_path or not os.path.exists(ckpt_path):
        return None
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu")
    low_sd: Dict[str, np.ndarray] = {}
    high_sd: Dict[str, np.ndarray] = {}
    for key, val in ckpt["model"].items():
        if "decoder" in key and "encoder" not in key:
            if "coarse" in key:
                low_sd[key[15:]] = val.detach().numpy()
            elif "fine" in key:
                high_sd[key[13:]] = val.detach().numpy()

    def apply_sd(dec: Dict[str, Any], sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        dec = jax.tree_util.tree_map(lambda x: x, dec)  # shallow copy
        if "embedder._B" in sd:
            dec["B"] = jnp.asarray(sd["embedder._B"])
        for i in range(len(dec["pts"])):
            dec["pts"][i] = {
                "w": jnp.asarray(sd[f"pts_linears.{i}.weight"].T),
                "b": jnp.asarray(sd[f"pts_linears.{i}.bias"]),
            }
            dec["fc_c"][i] = {
                "w": jnp.asarray(sd[f"fc_c.{i}.weight"].T),
                "b": jnp.asarray(sd[f"fc_c.{i}.bias"]),
            }
        dec["out"] = {
            "w": jnp.asarray(sd["output_linear.weight"].T),
            "b": jnp.asarray(sd["output_linear.bias"]),
        }
        return dec

    out = dict(params)
    out["low"] = apply_sd(params["low"], low_sd)
    out["high"] = apply_sd(params["high"], high_sd)
    return out


@functools.partial(jax.jit, static_argnames=("stage", "fused"))
def eval_points_chunk(params, pts, tsdf_volume, tsdf_bnds, bound, stage, fused=False):
    """One jitted chunk of the point-query path shared by the renderer's
    ``eval_points`` and the mesher: ``df_forward`` + the reference's
    out-of-bound occ=100 wall (ref: src/utils/Renderer.py:27-71)."""
    raw, _ = df_forward(
        params, pts, params, tsdf_volume, tsdf_bnds, bound, stage, fused=fused
    )
    inside = jnp.all((pts > bound[:, 0]) & (pts < bound[:, 1]), axis=-1)
    occ = jnp.where(inside, raw[:, 3], 100.0)
    return jnp.concatenate([raw[:, :3], occ[:, None]], axis=-1)
