"""Volume-rendering compositing: raw network outputs -> depth/var/rgb.

TPU-native equivalent of ``raw2outputs_nerf_color``
(ref: src/common.py:206-251). The framework always runs in occupancy mode
(cfg occupancy=True, ref: configs/df_prior.yaml:4): alpha = sigmoid(10*occ),
weights are alpha-composited transmittance products.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def raw2outputs(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    occupancy: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite per-sample predictions along rays.

    Args:
        raw: (R, S, 4) — rgb in [..., :3], occupancy logit (or density) in
            [..., 3].
        z_vals: (R, S) sample depths along each ray.
        rays_d: (R, 3) ray directions (their norm scales density-mode dists).
        occupancy: occupancy mode (alpha = sigmoid(10x)) vs density mode
            (alpha = 1 - exp(-relu(raw) * dist)).

    Returns:
        depth (R,), depth_var (R,), rgb (R, 3), weights (R, S).
    """
    rgb = raw[..., :3]
    if occupancy:
        alpha = jax.nn.sigmoid(10.0 * raw[..., 3])
    else:
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
        dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)
        alpha = 1.0 - jnp.exp(-jnp.maximum(raw[..., 3], 0.0) * dists)

    # Exclusive transmittance: cumprod of (1 - alpha + 1e-10).
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans  # (R, S)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    tmp = z_vals - depth_map[..., None]
    depth_var = jnp.sum(weights * tmp * tmp, axis=-1)
    return depth_map, depth_var, rgb_map, weights
