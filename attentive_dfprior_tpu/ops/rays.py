"""Ray generation, pixel sampling, and NeRF hierarchical (PDF) sampling.

Replaces the reference's torch ray library (ref: src/common.py:21-136,
254-272). The camera convention is OpenGL-style (-z forward): ray direction
in camera frame is [(i-cx)/fx, -(j-cy)/fy, -1].
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def get_rays_from_uv(
    i: jnp.ndarray,
    j: jnp.ndarray,
    c2w: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel coordinates -> world-space rays (ref: src/common.py:76-91).

    Args:
        i: (N,) pixel column (u/x) coordinates.
        j: (N,) pixel row (v/y) coordinates.
        c2w: (3, 4) or (4, 4) camera-to-world matrix (differentiable input —
            the tracker backprops through this).

    Returns:
        rays_o: (N, 3) origins; rays_d: (N, 3) directions (not normalized).
    """
    dirs = jnp.stack(
        [(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], axis=-1
    )  # (N, 3) camera frame
    # Explicit multiply-add instead of a matmul: a (N,3)x(3,3) contraction
    # would hit the MXU at bf16 default precision on TPU; pose accuracy is
    # precision-critical, and this is pure VPU work at f32.
    R = c2w[:3, :3]
    rays_d = jnp.sum(dirs[:, None, :] * R[None, :, :], axis=-1)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_rays_full_image(
    H: int, W: int, fx: float, fy: float, cx: float, cy: float, c2w: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rays for every pixel of an HxW image (ref: src/common.py:254-272).

    Returns:
        rays_o, rays_d: (H, W, 3).
    """
    jj, ii = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    o, d = get_rays_from_uv(ii.reshape(-1), jj.reshape(-1), c2w, fx, fy, cx, cy)
    return o.reshape(H, W, 3), d.reshape(H, W, 3)


def sample_pixels(
    key: jax.Array,
    H0: int,
    H1: int,
    W0: int,
    W1: int,
    n: int,
    depth: jnp.ndarray,
    color: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniformly sample n pixels (with replacement) from image region
    [H0:H1, W0:W1] (ref: src/common.py:94-124, select_uv/get_sample_uv).

    Args:
        key: PRNG key.
        depth: (H, W); color: (H, W, 3).

    Returns:
        i (N,) cols, j (N,) rows (float), sampled depth (N,), color (N, 3).
    """
    h = H1 - H0
    w = W1 - W0
    idx = jax.random.randint(key, (n,), 0, h * w)
    jj = idx // w + H0
    ii = idx % w + W0
    d = depth[jj, ii]
    c = color[jj, ii]
    return ii.astype(jnp.float32), jj.astype(jnp.float32), d, c


def get_samples(
    key: jax.Array,
    H0: int,
    H1: int,
    W0: int,
    W1: int,
    n: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    c2w: jnp.ndarray,
    depth: jnp.ndarray,
    color: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample n rays from an image region (ref: src/common.py:127-136).

    Returns:
        rays_o (N,3), rays_d (N,3), gt_depth (N,), gt_color (N,3).
    """
    i, j, d, c = sample_pixels(key, H0, H1, W0, W1, n, depth, color)
    rays_o, rays_d = get_rays_from_uv(i, j, c2w, fx, fy, cx, cy)
    return rays_o, rays_d, d, c


def sample_pdf(
    key: jax.Array,
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    N_samples: int,
    det: bool = False,
) -> jnp.ndarray:
    """Hierarchical sampling via inverse-CDF (ref: src/common.py:21-65).

    Args:
        bins: (B, M) bin edges; weights: (B, M-1)... matching the reference's
            call contract (bins = z_vals midpoints, weights interior).

    Returns:
        (B, N_samples) resampled positions.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (B, M)

    if det:
        u = jnp.linspace(0.0, 1.0, N_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (N_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (N_samples,), dtype=cdf.dtype)

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_above = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def ray_bound_intersection(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, bound: jnp.ndarray
) -> jnp.ndarray:
    """Distance along each ray to the exit of the axis-aligned scene bound.

    Matches the reference's far-plane computation
    (ref: src/utils/Renderer.py:148-155 and src/Mapper.py:439-445):
    t = min over axes of max((b - o)/d) per axis pair.

    Returns:
        (N,) exit distances (can be negative/inf for degenerate rays, exactly
        like the reference; callers clamp).
    """
    t = (bound[None, :, :] - rays_o[:, :, None]) / rays_d[:, :, None]  # (N, 3, 2)
    return jnp.min(jnp.max(t, axis=2), axis=1)
