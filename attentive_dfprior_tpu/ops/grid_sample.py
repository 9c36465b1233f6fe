"""Trilinear feature-grid sampling (align_corners=True, border padding).

The TPU-native replacement for the reference's ``F.grid_sample`` trilinear
lookups (ref: src/conv_onet/models/decoder.py:168-175, 230-238, 295-303 and
src/utils/Renderer.py:73-81).

Layout: grids are stored channels-last in natural (X, Y, Z, C) order. The
reference stores torch grids as [1, C, Z, Y, X] purely to satisfy
grid_sample's (W<-x, H<-y, D<-z) convention (ref: src/DF_Prior.py:243-244);
in JAX we index directly so no axis swap exists anywhere in this framework.

Numerics match torch's ``F.grid_sample(..., padding_mode='border',
align_corners=True, mode='bilinear')`` to float32 round-off: the normalized
coordinate in [-1, 1] is unnormalized as (p+1)/2*(n-1), clamped to
[0, n-1] (border), and trilinearly blended between the 8 neighbors.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def normalize_3d_coordinate(p: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """Map world coordinates into [-1, 1]^3 given a (3, 2) bound.

    (ref: src/common.py:275-290)

    Args:
        p: (..., 3) world coordinates.
        bound: (3, 2) [min, max] per axis.

    Returns:
        (..., 3) normalized coordinates.
    """
    lo = bound[:, 0]
    hi = bound[:, 1]
    return (p - lo) / (hi - lo) * 2.0 - 1.0


def trilinear_sample(grid: jnp.ndarray, p_norm: jnp.ndarray) -> jnp.ndarray:
    """Sample a channels-last 3D grid at normalized coordinates.

    Args:
        grid: (NX, NY, NZ, C) feature volume.
        p_norm: (N, 3) coordinates in [-1, 1] (x, y, z order; values outside
            the range are clamped -> border padding).

    Returns:
        (N, C) interpolated features.
    """
    nx, ny, nz, C = grid.shape
    dims = jnp.array([nx, ny, nz], dtype=p_norm.dtype)
    # align_corners=True unnormalization, then border clamp.
    idx = (p_norm + 1.0) * 0.5 * (dims - 1.0)
    idx = jnp.clip(idx, 0.0, dims - 1.0)

    i0 = jnp.floor(idx).astype(jnp.int32)
    i0 = jnp.minimum(i0, jnp.array([nx - 1, ny - 1, nz - 1], dtype=jnp.int32))
    i1 = jnp.minimum(i0 + 1, jnp.array([nx - 1, ny - 1, nz - 1], dtype=jnp.int32))
    f = idx - i0.astype(idx.dtype)  # (N, 3) fractional part

    x0, y0, z0 = i0[:, 0], i0[:, 1], i0[:, 2]
    x1, y1, z1 = i1[:, 0], i1[:, 1], i1[:, 2]
    fx, fy, fz = f[:, 0:1], f[:, 1:2], f[:, 2:3]

    # Flatten to a (NX*NY*NZ, C) matrix: row gathers lower well on TPU.
    flat = grid.reshape(-1, C)

    def gather(ix, iy, iz):
        lin = (ix * ny + iy) * nz + iz
        return jnp.take(flat, lin, axis=0)

    c000 = gather(x0, y0, z0)
    c001 = gather(x0, y0, z1)
    c010 = gather(x0, y1, z0)
    c011 = gather(x0, y1, z1)
    c100 = gather(x1, y0, z0)
    c101 = gather(x1, y0, z1)
    c110 = gather(x1, y1, z0)
    c111 = gather(x1, y1, z1)

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def sample_feature_grid(
    grid: jnp.ndarray, p: jnp.ndarray, bound: jnp.ndarray
) -> jnp.ndarray:
    """World-space points -> trilinearly interpolated grid features.

    Equivalent of MLP.sample_grid_feature (ref: decoder.py:168-175).

    Args:
        grid: (NX, NY, NZ, C).
        p: (N, 3) world coordinates.
        bound: (3, 2) grid bound.

    Returns:
        (N, C) features.
    """
    return trilinear_sample(grid, normalize_3d_coordinate(p, bound))
