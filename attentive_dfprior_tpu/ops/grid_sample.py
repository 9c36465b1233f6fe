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
import numpy as np


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


def _corner_indices_weights(grid_shape, p_norm):
    """Shared index/weight computation: corner linear ids (N, 8) and
    trilinear weights (N, 8)."""
    nx, ny, nz = grid_shape[:3]
    dims = jnp.array([nx, ny, nz], dtype=p_norm.dtype)
    idx = (p_norm + 1.0) * 0.5 * (dims - 1.0)
    idx = jnp.clip(idx, 0.0, dims - 1.0)
    i0 = jnp.floor(idx).astype(jnp.int32)
    i0 = jnp.minimum(i0, jnp.array([nx - 1, ny - 1, nz - 1], dtype=jnp.int32))
    i1 = jnp.minimum(i0 + 1, jnp.array([nx - 1, ny - 1, nz - 1], dtype=jnp.int32))
    f = idx - i0.astype(idx.dtype)
    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]

    corners = []
    weights = []
    for cx, wx in ((i0[:, 0], 1 - fx), (i1[:, 0], fx)):
        for cy, wy in ((i0[:, 1], 1 - fy), (i1[:, 1], fy)):
            for cz, wz in ((i0[:, 2], 1 - fz), (i1[:, 2], fz)):
                corners.append((cx * ny + cy) * nz + cz)
                weights.append(wx * wy * wz)
    return jnp.stack(corners, axis=1), jnp.stack(weights, axis=1)


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


def _build_zpair(grid: jnp.ndarray) -> jnp.ndarray:
    """(NX, NY, NZ, C) grid -> (NX*NY*NZ, 2C) z-pair rows.

    Row v holds [grid[v], grid[v + 1 in z]]; the last z-plane repeats
    itself, which is never read with nonzero weight (border clamp implies
    fz == 0 exactly there — same argument as the cell-stencil border
    note). Doubles the bytes per row to 256 at C=32 so each corner pair
    costs ONE ~512-byte-transaction row gather instead of two 128-byte
    ones. A dense build (one elementwise pass over the grid) per sampled
    grid per iteration; its autodiff transpose is two shifted adds.
    """
    nx, ny, nz, C = grid.shape
    flat = grid.reshape(nx * ny * nz, C)
    shifted = jnp.concatenate(
        [grid[:, :, 1:, :], grid[:, :, nz - 1 :, :]], axis=2
    ).reshape(nx * ny * nz, C)
    return jnp.concatenate([flat, shifted], axis=1)


def trilinear_sample_zpair(grid: jnp.ndarray, p_norm: jnp.ndarray) -> jnp.ndarray:
    """trilinear_sample via 4 wide z-pair row gathers (value-identical
    association: z-mix per row first, then the same y/x combines)."""
    nx, ny, nz, C = grid.shape
    dims = jnp.array([nx, ny, nz], dtype=p_norm.dtype)
    idx = (p_norm + 1.0) * 0.5 * (dims - 1.0)
    idx = jnp.clip(idx, 0.0, dims - 1.0)
    i0 = jnp.floor(idx).astype(jnp.int32)
    i0 = jnp.minimum(i0, jnp.array([nx - 1, ny - 1, nz - 1], dtype=jnp.int32))
    i1 = jnp.minimum(i0 + 1, jnp.array([nx - 1, ny - 1, nz - 1], dtype=jnp.int32))
    f = idx - i0.astype(idx.dtype)
    x0, y0, z0 = i0[:, 0], i0[:, 1], i0[:, 2]
    x1, y1 = i1[:, 0], i1[:, 1]
    fx, fy, fz = f[:, 0:1], f[:, 1:2], f[:, 2:3]

    dup = _build_zpair(grid)

    def gather(ix, iy):
        return jnp.take(dup, (ix * ny + iy) * nz + z0, axis=0)  # (N, 2C)

    def zmix(r):
        return r[:, :C] * (1 - fz) + r[:, C:] * fz

    c00 = zmix(gather(x0, y0))
    c01 = zmix(gather(x0, y1))
    c10 = zmix(gather(x1, y0))
    c11 = zmix(gather(x1, y1))
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def sample_feature_grid(
    grid: jnp.ndarray, p: jnp.ndarray, bound: jnp.ndarray
) -> jnp.ndarray:
    """World-space points -> trilinearly interpolated grid features.

    Equivalent of MLP.sample_grid_feature (ref: decoder.py:168-175).

    The default impl is trilinear_sample_halo (Pallas single-read
    halo-fold VJP — the measured-best full mapping step, 18.7 -> 15.1 ms,
    1.24x). DFPRIOR_TRILINEAR_VJP selects others: =bitfold the XLA 3-stage
    fold (16.7 ms, no Pallas dependency), =cellstencil the round-4
    transpose+stencil, =xla the autodiff transpose, =pallas / =sorted the
    shelved negative-result experiments. NOTE the z-pair forward
    (trilinear_sample_zpair) is deliberately NOT used here: it wins
    isolated forward-only gathers 1.5x but costs ~2 ms inside the full
    mapping step (measured both ways, 2026-08-21).

    Args:
        grid: (NX, NY, NZ, C).
        p: (N, 3) world coordinates.
        bound: (3, 2) grid bound.

    Returns:
        (N, C) features.
    """
    import os

    impl = os.environ.get("DFPRIOR_TRILINEAR_VJP", "halo")
    fn = {
        "sorted": trilinear_sample_opt,
        "xla": trilinear_sample,
        "pallas": trilinear_sample_psc,
        "halo": trilinear_sample_halo,
        "bitfold": trilinear_sample_bf,
    }.get(impl, trilinear_sample_cs)
    return fn(grid, normalize_3d_coordinate(p, bound))


# ---------------------------------------------------------------------------
# Optimized custom-VJP variant: sorted segmented-reduce grid gradient
# ---------------------------------------------------------------------------
#
# The autodiff transpose of the 8-corner gather is an XLA scatter-add with
# duplicate indices, which TPUs execute row-serially (~7 ms for the 384k-row
# scatter of one mapping iteration at reference workload). This variant sorts
# the corner updates by voxel, collapses duplicate rows with a vectorized
# segmented reduction (cumsum + associative scan), and performs a single
# UNIQUE-index scatter, which XLA can vectorize. Select with
# DFPRIOR_TRILINEAR_VJP=sorted.
#
# MEASURED ON TPU (2026-08-19, room0 high grid 74x56x44x32): at N=4,800
# points, xla 2.56 ms vs sorted 4.64 ms per backward (sorted also pays an
# 84 s compile); at the reference workload N=48,000 the sorted variant did
# not finish compiling in 10 minutes (the associative_scan's log-depth
# structure blows up XLA), while xla runs 9.5 ms with a 2 s compile.
# VERDICT: the default stays "xla"; this variant is kept as an
# env-selectable experiment only.


def _segmented_unique_scatter(
    ids: jnp.ndarray, vals: jnp.ndarray, nrows: int
) -> jnp.ndarray:
    """Scatter-add rows with duplicate ids via sort + segmented reduce +
    unique-index scatter.

    Args:
        ids: (M,) int32 row ids in [0, nrows).
        vals: (M, C) values.

    Returns:
        (nrows, C) accumulated rows.
    """
    M, C = vals.shape
    order = jnp.argsort(ids)
    sid = jnp.take(ids, order)
    sval = jnp.take(vals, order, axis=0)
    csum = jnp.cumsum(sval, axis=0)
    changed = sid[1:] != sid[:-1]
    is_start = jnp.concatenate([jnp.ones((1,), bool), changed])
    is_end = jnp.concatenate([changed, jnp.ones((1,), bool)])
    csum_prev = jnp.concatenate([jnp.zeros((1, C), csum.dtype), csum[:-1]], axis=0)

    # broadcast each run-start's exclusive prefix to its whole run
    def combine(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb[:, None], vb, va)

    _, base = jax.lax.associative_scan(
        combine, (is_start, jnp.where(is_start[:, None], csum_prev, 0.0))
    )
    run_total = csum - base  # correct at run-end positions

    out_ids = jnp.where(is_end, sid, nrows + jnp.arange(M, dtype=sid.dtype))
    buf = jnp.zeros((nrows + M, C), vals.dtype)
    buf = buf.at[out_ids].set(
        jnp.where(is_end[:, None], run_total, 0.0), unique_indices=True
    )
    return buf[:nrows]


# ---------------------------------------------------------------------------
# Cell-scatter + stencil grid gradient — the production trilinear VJP
# ---------------------------------------------------------------------------
#
# XLA lowers scatter-add on TPU to a row-serialized loop (~14 ns/row,
# insensitive to duplicates and to unique_indices — measured,
# scripts/bench_scatter.py part 1), so the autodiff transpose of the
# 8-corner gather costs 8N row-stores. This VJP scatters ONE wide
# (8C-column) row per point into a cell-indexed buffer (cells are indexed
# by the floor corner i0), then converts cell-corner sums to the voxel
# gradient with a dense 8-way pad-shift stencil after a single
# corner-major transpose. 8x fewer scatter rows; the stencil is pure
# vectorized bandwidth.
#
# Border exactness: when i0 is clamped to n-1 the fractional part f is 0,
# so every i1-corner weight carries a factor of 0 — the stencil's
# out-of-range spill is zero-valued and zero-padded shift-adds reproduce
# the collapsed-corner (i1 = min(i0+1, n-1)) semantics exactly (parity
# 1.5e-7 rel incl. border-clamped points, tests/test_grid_sample_vjp.py).
#
# MEASURED ON TPU (2026-08-20, room0 high grid 74x56x44x32, reference
# workload 48k points): XLA transpose 6.92 ms -> 4.49 ms (1.54x); the raw
# wide-row scatter is 1.36 ms of that (scripts/bench_scatter.py b5).


def _cell_scatter(grid_shape, p_norm: jnp.ndarray, ct: jnp.ndarray) -> jnp.ndarray:
    """Scatter each point's 8 weighted corner updates into one wide
    (8C)-column row of a cell buffer (cell = floor corner i0).

    Returns:
        (nvox, 8C) cell buffer.
    """
    nx, ny, nz, C = grid_shape
    n_pts = p_norm.shape[0]
    nvox = nx * ny * nz
    dims = jnp.array([nx, ny, nz], dtype=p_norm.dtype)
    idx = (p_norm + 1.0) * 0.5 * (dims - 1.0)
    idx = jnp.clip(idx, 0.0, dims - 1.0)
    i0 = jnp.floor(idx).astype(jnp.int32)
    i0 = jnp.minimum(i0, jnp.array([nx - 1, ny - 1, nz - 1], dtype=jnp.int32))
    f = idx - i0.astype(idx.dtype)
    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]

    # corner weights in x, y, z-fastest order (matches trilinear_sample)
    ws = []
    for wx in (1 - fx, fx):
        for wy in (1 - fy, fy):
            for wz in (1 - fz, fz):
                ws.append(wx * wy * wz)
    w = jnp.stack(ws, axis=1)  # (N, 8)
    upd = (w[:, :, None] * ct[:, None, :]).reshape(n_pts, 8 * C)
    cell = (i0[:, 0] * ny + i0[:, 1]) * nz + i0[:, 2]
    return jnp.zeros((nvox, 8 * C), upd.dtype).at[cell].add(upd)


def _cell_stencil_grid_grad(
    grid_shape, p_norm: jnp.ndarray, ct: jnp.ndarray
) -> jnp.ndarray:
    """Gradient of trilinear_sample w.r.t. the grid via cell-scatter +
    dense stencil.

    Args:
        grid_shape: (NX, NY, NZ, C) static shape tuple.
        p_norm: (N, 3) normalized query points.
        ct: (N, C) cotangent of the sampled features.

    Returns:
        (NX, NY, NZ, C) grid gradient.
    """
    nx, ny, nz, C = grid_shape
    nvox = nx * ny * nz
    cells = _cell_scatter(grid_shape, p_norm, ct)
    corner_major = jnp.transpose(
        cells.reshape(nvox, 8, C), (1, 0, 2)
    )  # one relayout; per-corner slices below are then contiguous
    parts = []
    ci = 0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                y = corner_major[ci].reshape(nx, ny, nz, C)
                parts.append(
                    jnp.pad(
                        y[: nx - dx, : ny - dy, : nz - dz],
                        ((dx, 0), (dy, 0), (dz, 0), (0, 0)),
                    )
                )
                ci += 1
    out = parts[0]
    for pslice in parts[1:]:
        out = out + pslice
    return out


def _cell_bitfold_grid_grad(grid_shape, cells: jnp.ndarray) -> jnp.ndarray:
    """Cell buffer -> grid gradient via a 3-stage axis bit-fold (no
    corner-major transpose).

    The corner index inside the wide row is (cx, cy, cz)-lexicographic
    (ci = cx*4 + cy*2 + cz — see _cell_scatter), so the 8-corner stencil

        grad[x,y,z,c] = sum_d cells[x-cx, y-cy, z-cz, corner(cx,cy,cz), c]

    factorizes into one shifted add per AXIS, each halving the column
    count: fold cx (8C->4C, a 128-lane-aligned split at C=32), then cy
    (4C->2C), then cz (2C->C). Data touched: 186 + 93 + 47 + 23 MB for the
    room0 high grid vs the transpose formulation's 372 + 207 + 186-read —
    and every slice is layout-friendly (no (nvox, 8, C) -> (8, nvox, C)
    relayout).

    Args:
        grid_shape: static (NX, NY, NZ, C).
        cells: (NX*NY*NZ, 8C) cell-corner buffer from _cell_scatter.

    Returns:
        (NX, NY, NZ, C) gradient.
    """
    nx, ny, nz, C = grid_shape
    B = cells.reshape(nx, ny, nz, 8 * C)
    # fold cx: A1[x, ..., (cy,cz)c] = B[x, (0,cy,cz)c] + B[x-1, (1,cy,cz)c]
    A1 = B[..., : 4 * C] + jnp.pad(
        B[: nx - 1, ..., 4 * C :], ((1, 0), (0, 0), (0, 0), (0, 0))
    )
    # fold cy
    A2 = A1[..., : 2 * C] + jnp.pad(
        A1[:, : ny - 1, :, 2 * C :], ((0, 0), (1, 0), (0, 0), (0, 0))
    )
    # fold cz
    return A2[..., :C] + jnp.pad(
        A2[:, :, : nz - 1, C:], ((0, 0), (0, 0), (1, 0), (0, 0))
    )


@jax.custom_vjp
def trilinear_sample_cs(grid: jnp.ndarray, p_norm: jnp.ndarray) -> jnp.ndarray:
    """trilinear_sample with the cell-scatter+stencil grid gradient."""
    return trilinear_sample(grid, p_norm)


def _cs_fwd(grid, p_norm):
    return trilinear_sample(grid, p_norm), (grid, p_norm)


def _cs_bwd(res, g):
    grid, p_norm = res
    # point gradient: autodiff of the gather-only path (XLA DCEs this
    # entire branch when the caller does not request point gradients,
    # e.g. in the mapping loop where poses are fixed)
    _, pullback = jax.vjp(
        lambda p: trilinear_sample(jax.lax.stop_gradient(grid), p), p_norm
    )
    (p_grad,) = pullback(g)
    grid_grad = _cell_stencil_grid_grad(grid.shape, p_norm, g)
    return grid_grad, p_grad


trilinear_sample_cs.defvjp(_cs_fwd, _cs_bwd)


# ---------------------------------------------------------------------------
# Cell-scatter + bit-fold / Pallas-halo grid gradients (round-5 kernels)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def trilinear_sample_bf(grid: jnp.ndarray, p_norm: jnp.ndarray) -> jnp.ndarray:
    """The round-5 production trilinear sampler: z-pair wide-row forward
    gather (bit-identical values to trilinear_sample; 1.5x on isolated
    forward-only paths, neutral inside the fused mapping step) + the
    cell-scatter + XLA 3-stage bit-fold grid gradient.

    Measured 2026-08-21 (room0 reference workload, same session): full
    mapping iteration 18.70 -> 16.57 ms (1.13x) vs the round-4
    cellstencil. The Pallas halo kernel (=halo) wins the VJP in isolation
    (fwd+bwd 13.49 vs 14.77 ms) but loses ~2.4 ms of Adam-side fusion at
    the custom-call boundary in the full step — kept env-selectable for
    VJP-heavy contexts without a fused optimizer consumer."""
    return trilinear_sample(grid, p_norm)


def _bf_fwd(grid, p_norm):
    return trilinear_sample(grid, p_norm), (grid, p_norm)


def _bf_bwd(res, g):
    grid, p_norm = res
    _, pullback = jax.vjp(
        lambda p: trilinear_sample(jax.lax.stop_gradient(grid), p), p_norm
    )
    (p_grad,) = pullback(g)
    cells = _cell_scatter(grid.shape, p_norm, g)
    return _cell_bitfold_grid_grad(grid.shape, cells), p_grad


trilinear_sample_bf.defvjp(_bf_fwd, _bf_bwd)


@jax.custom_vjp
def trilinear_sample_halo(grid: jnp.ndarray, p_norm: jnp.ndarray) -> jnp.ndarray:
    """trilinear_sample with the cell-scatter + Pallas halo-fold grid
    gradient (single-read bit-fold stencil, ops/pallas/halo_fold_kernel.py).
    THE PRODUCTION DEFAULT: full mapping iteration 18.70 -> 15.12 ms
    (1.24x) vs the round-4 cellstencil; high-grid VJP 2.81 vs 4.49 ms,
    2.5x over the autodiff transpose (measured 2026-08-21 at the 48k-point
    reference workload, same session for every number)."""
    return trilinear_sample(grid, p_norm)


def _halo_fwd(grid, p_norm):
    return trilinear_sample(grid, p_norm), (grid, p_norm)


def _halo_bwd(res, g):
    from attentive_dfprior_tpu.ops.pallas.halo_fold_kernel import cell_fold_halo

    grid, p_norm = res
    _, pullback = jax.vjp(
        lambda p: trilinear_sample(jax.lax.stop_gradient(grid), p), p_norm
    )
    (p_grad,) = pullback(g)
    cells = _cell_scatter(grid.shape, p_norm, g)
    grid_grad = cell_fold_halo(
        cells, grid.shape, bx=8, interpret=jax.default_backend() == "cpu"
    )
    return grid_grad, p_grad


trilinear_sample_halo.defvjp(_halo_fwd, _halo_bwd)


# ---------------------------------------------------------------------------
# Fused same-shape pair sampling (high + color grids) — round-5 follow-up
# ---------------------------------------------------------------------------
#
# The color-stage mapping step samples grid_high and grid_color at the SAME
# points (models/decoders.py:df_forward); both grids share grid_len 0.16 in
# every shipped config (reference included), hence identical (NX, NY, NZ).
# XLA's scatter-add is row-serial (~14 ns/row regardless of row width —
# scripts/bench_scatter.py), so scattering BOTH cotangents as one
# (nvox, 16C)-wide row halves the dominant row-serial cost of the two cell
# scatters, and the bit-fold runs once at doubled width (same total bytes).
# The fold kernels generalize unchanged: the corner index stays
# lexicographic-major over a 2C channel block [grad_a | grad_b].
#
# Reference counterpart: the two independent cuDNN grid_sample backwards of
# ref src/conv_onet/models/decoder.py:168-175 (fine + color decoders).


@jax.custom_vjp
def trilinear_sample_pair(
    grid_a: jnp.ndarray, grid_b: jnp.ndarray, p_norm: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample two same-shape grids at the same points with a FUSED grid
    gradient: one (nvox, 16C) cell scatter + one doubled-width fold instead
    of two independent (nvox, 8C) scatter+folds.

    Args:
        grid_a, grid_b: (NX, NY, NZ, C) — shapes must match.
        p_norm: (N, 3) normalized coordinates.

    Returns:
        ((N, C), (N, C)) interpolated features.
    """
    return trilinear_sample(grid_a, p_norm), trilinear_sample(grid_b, p_norm)


def _pair_fwd(grid_a, grid_b, p_norm):
    return trilinear_sample_pair(grid_a, grid_b, p_norm), (
        grid_a,
        grid_b,
        p_norm,
    )


def _pair_bwd(res, g):
    grid_a, grid_b, p_norm = res
    g_a, g_b = g
    # point gradient through both gathers (DCE'd when poses are fixed)
    _, pullback = jax.vjp(
        lambda p: (
            trilinear_sample(jax.lax.stop_gradient(grid_a), p),
            trilinear_sample(jax.lax.stop_gradient(grid_b), p),
        ),
        p_norm,
    )
    (p_grad,) = pullback((g_a, g_b))

    nx, ny, nz, C = grid_a.shape
    joint_shape = (nx, ny, nz, 2 * C)
    ct = jnp.concatenate([g_a, g_b], axis=1)  # (N, 2C)
    cells = _cell_scatter(joint_shape, p_norm, ct)  # (nvox, 16C)
    import os

    impl = os.environ.get("DFPRIOR_TRILINEAR_VJP", "halo")
    if impl == "halo":
        from attentive_dfprior_tpu.ops.pallas.halo_fold_kernel import (
            cell_fold_halo,
        )

        joint = cell_fold_halo(
            cells,
            joint_shape,
            bx=8,
            interpret=jax.default_backend() == "cpu",
        )
    else:
        joint = _cell_bitfold_grid_grad(joint_shape, cells)
    return joint[..., :C], joint[..., C:], p_grad


trilinear_sample_pair.defvjp(_pair_fwd, _pair_bwd)


def sample_feature_grid_pair(
    grid_a: jnp.ndarray,
    grid_b: jnp.ndarray,
    p: jnp.ndarray,
    bound: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World-space fused pair sampling of two same-shape feature grids.

    Falls back to two independent sample_feature_grid calls when the
    shapes differ or a non-fold VJP impl is selected via
    DFPRIOR_TRILINEAR_VJP (the fused path exists for the fold family
    only; =xla/=cellstencil/... keep their per-grid semantics).
    """
    import os

    impl = os.environ.get("DFPRIOR_TRILINEAR_VJP", "halo")
    if grid_a.shape != grid_b.shape or impl not in ("halo", "bitfold"):
        return (
            sample_feature_grid(grid_a, p, bound),
            sample_feature_grid(grid_b, p, bound),
        )
    p_norm = normalize_3d_coordinate(p, bound)
    return trilinear_sample_pair(grid_a, grid_b, p_norm)


# ---------------------------------------------------------------------------
# Wide-row scalar-volume sampling (Z-row layout) — the TSDF-prior fast path
# ---------------------------------------------------------------------------
#
# Sampling the 196M-voxel room0-scale TSDF prior with trilinear_sample costs
# 13.2 ms of the 36.9 ms reference-workload mapping iteration
# (scripts/profile_mapping.py): flattened to an (X*Y*Z, 1) row matrix, each
# of the 8 corner lookups is a width-1 row gather — the pathological TPU
# gather shape (one 4-byte element per 512-byte lane transaction). Storing
# the volume as (X*Y, ZP) rows (Z padded to the 128-float lane width) turns
# the lookup into 4 WIDE row gathers (the xy corner columns) + an
# in-register bilinear-xy combine + a masked z-select: measured 6.6x faster
# (1.95 ms/iter, scripts/bench_tsdf_gather.py v2_zrows) and numerically
# within float32 index-arithmetic round-off (~1e-4) of trilinear_sample.
#
# The container is a pytree (rows leaf, dims static aux) so it passes
# transparently through jit/sharding wherever a plain (X, Y, Z) volume did.
# Gradients w.r.t. the query points flow through the interpolation weights
# exactly as in trilinear_sample (the volume itself is a constant prior —
# nothing differentiates w.r.t. it).


@jax.tree_util.register_pytree_node_class
class TSDFRows:
    """A (X, Y, Z) scalar volume stored as (X*Y, ZP) Z-rows, ZP % 128 == 0."""

    def __init__(self, rows: jnp.ndarray, dims: Tuple[int, int, int]):
        self.rows = rows
        self.dims = tuple(int(d) for d in dims)

    @property
    def shape(self) -> Tuple[int, int, int]:
        return self.dims

    def tree_flatten(self):
        return (self.rows,), self.dims

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


def tsdf_to_rows(vol) -> "TSDFRows":
    """Convert a (X, Y, Z) volume to the wide-row layout (host-side pad)."""
    vol_np = np.asarray(vol, dtype=np.float32)
    nx, ny, nz = vol_np.shape
    zp = int(np.ceil(nz / 128)) * 128
    padded = np.zeros((nx, ny, zp), np.float32)
    padded[:, :, :nz] = vol_np
    return TSDFRows(jnp.asarray(padded.reshape(nx * ny, zp)), (nx, ny, nz))


def trilinear_sample_rows(t: TSDFRows, p_norm: jnp.ndarray) -> jnp.ndarray:
    """trilinear_sample (border, align_corners=True) on a TSDFRows volume.

    Args:
        t: TSDFRows wide-row volume.
        p_norm: (N, 3) coordinates in [-1, 1].

    Returns:
        (N,) interpolated scalars.
    """
    nx, ny, nz = t.dims
    dims = jnp.array([nx, ny, nz], dtype=p_norm.dtype)
    idx = (p_norm + 1.0) * 0.5 * (dims - 1.0)
    idx = jnp.clip(idx, 0.0, dims - 1.0)
    i0 = jnp.floor(idx).astype(jnp.int32)
    i0 = jnp.minimum(i0, jnp.array([nx - 1, ny - 1, nz - 1], dtype=jnp.int32))
    i1 = jnp.minimum(i0 + 1, jnp.array([nx - 1, ny - 1, nz - 1], dtype=jnp.int32))
    f = idx - i0.astype(idx.dtype)

    x0, y0, z0 = i0[:, 0], i0[:, 1], i0[:, 2]
    x1, y1 = i1[:, 0], i1[:, 1]
    z1 = i1[:, 2]
    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]

    r00 = jnp.take(t.rows, x0 * ny + y0, axis=0)  # (N, ZP)
    r01 = jnp.take(t.rows, x0 * ny + y1, axis=0)
    r10 = jnp.take(t.rows, x1 * ny + y0, axis=0)
    r11 = jnp.take(t.rows, x1 * ny + y1, axis=0)
    # bilinear xy combine FIRST: the z-select then reads ONE row
    row = (
        r00 * ((1 - fx) * (1 - fy))[:, None]
        + r01 * ((1 - fx) * fy)[:, None]
        + r10 * (fx * (1 - fy))[:, None]
        + r11 * (fx * fy)[:, None]
    )
    zi = jnp.arange(t.rows.shape[1], dtype=jnp.int32)[None, :]
    v0 = jnp.sum(jnp.where(zi == z0[:, None], row, 0.0), axis=1)
    v1 = jnp.sum(jnp.where(zi == z1[:, None], row, 0.0), axis=1)
    return v0 * (1 - fz) + v1 * fz


@jax.custom_vjp
def trilinear_sample_opt(grid: jnp.ndarray, p_norm: jnp.ndarray) -> jnp.ndarray:
    """trilinear_sample with the optimized grid-gradient scatter."""
    return trilinear_sample(grid, p_norm)


def _tso_fwd(grid, p_norm):
    return trilinear_sample(grid, p_norm), (grid, p_norm)


def _tso_bwd(res, g):
    grid, p_norm = res
    nx, ny, nz, C = grid.shape
    # point gradient: autodiff of the gather-only path (no scatter involved)
    _, pullback = jax.vjp(
        lambda p: trilinear_sample(jax.lax.stop_gradient(grid), p), p_norm
    )
    (p_grad,) = pullback(g)

    ids, w = _corner_indices_weights(grid.shape, p_norm)  # (N, 8) each
    vals = (w[..., None] * g[:, None, :]).reshape(-1, C)  # (8N, C)
    grid_grad = _segmented_unique_scatter(
        ids.reshape(-1), vals, nx * ny * nz
    ).reshape(grid.shape)
    return grid_grad, p_grad


trilinear_sample_opt.defvjp(_tso_fwd, _tso_bwd)


# ---------------------------------------------------------------------------
# Cell-scatter + PALLAS stencil grid gradient (transpose-free)
# ---------------------------------------------------------------------------
#
# Same cell buffer as trilinear_sample_cs, but the corner-sum stencil runs
# as a Pallas kernel that reads the (nvox, 8C) buffer once per x-plane and
# writes the gradient plane directly — no corner-major transpose, no 8
# slab materializations (ops/pallas/stencil_kernel.py). Select with
# DFPRIOR_TRILINEAR_VJP=pallas.


@jax.custom_vjp
def trilinear_sample_psc(grid: jnp.ndarray, p_norm: jnp.ndarray) -> jnp.ndarray:
    """trilinear_sample with the cell-scatter + Pallas-stencil gradient."""
    return trilinear_sample(grid, p_norm)


def _psc_fwd(grid, p_norm):
    return trilinear_sample(grid, p_norm), (grid, p_norm)


def _psc_bwd(res, g):
    from attentive_dfprior_tpu.ops.pallas.stencil_kernel import (
        cell_stencil_pallas,
    )

    grid, p_norm = res
    _, pullback = jax.vjp(
        lambda p: trilinear_sample(jax.lax.stop_gradient(grid), p), p_norm
    )
    (p_grad,) = pullback(g)
    cells = _cell_scatter(grid.shape, p_norm, g)
    grid_grad = cell_stencil_pallas(
        cells, grid.shape, interpret=jax.default_backend() == "cpu"
    )
    return grid_grad, p_grad


trilinear_sample_psc.defvjp(_psc_fwd, _psc_bwd)
