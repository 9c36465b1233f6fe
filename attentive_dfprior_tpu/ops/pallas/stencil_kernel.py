"""Cell-buffer -> grid-gradient stencil as a Pallas TPU kernel.

Second half of the cell-scatter trilinear VJP (ops/grid_sample.py:
_cell_stencil_grid_grad): the scatter accumulates each query point's 8
weighted corner updates into ONE wide (8C)-column row of a cell buffer
(cell = floor corner i0); the stencil then forms

    grad[x, y, z, c] = sum_{dx,dy,dz in {0,1}}  cells[x-dx, y-dy, z-dz,
                                                      corner(dx,dy,dz), c]

The XLA formulation materializes a corner-major transpose of the whole
(nvox, 8C) buffer (186 MB for the room0 high grid) plus 8 shifted slab
adds — ~3 ms of HBM traffic per big grid per iteration. This kernel reads
the cell buffer ONCE, plane by plane along x, and writes the gradient
plane directly:

  - grid over x: step x reads cells plane x (dx=0 corners) and plane x-1
    (dx=1 corners; the same array bound twice with a shifted index_map),
  - y-shift = sublane roll with zero fill, z-shift = whole-(8C)-group lane
    roll with zero fill (both 128-aligned moves for C=32),
  - corner extraction from the 8C=256-lane row is NOT a (misaligned)
    32-lane slice: it is folded into one (256, C) one-hot matmul per
    (shift, corner) on the otherwise-idle MXU (~24 GFLOP per room0-grid
    VJP = noise), which also performs the summation into the accumulator.

Numerics: pure adds/matmul-by-{0,1} — bit-identical reassociation-free
per-corner sums; parity vs the XLA stencil tested in
tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _selectors(C: int) -> np.ndarray:
    """(8, 8C, C) one-hot extraction matrices: S[ci] @ picks corner ci."""
    S = np.zeros((8, 8 * C, C), np.float32)
    for ci in range(8):
        S[ci, ci * C : (ci + 1) * C, :] = np.eye(C, dtype=np.float32)
    return S


def _kernel(ny, nz, C, cur_ref, prev_ref, sel_ref, out_ref):
    # blocks are native (ny, nz, 8C) x-planes: all shifts are pad-slices on
    # the leading dims and the corner extraction contracts the trailing 8C
    # axis with a one-hot (8C, C) matrix — no in-kernel reshapes (Mosaic
    # rejects lane-dim splitting shape casts)
    x = pl.program_id(0)

    def plane_contrib(p3, dx):
        # p3: (ny, nz, 8C). Extract each corner FIRST (one (8C, C) one-hot
        # contraction -> a C-wide slab), THEN shift the small result —
        # shifting the wide inputs instead materialized 8 x 2.5 MB slabs
        # and blew the 16 MB scoped-vmem stack
        acc = jnp.zeros((ny, nz, C), jnp.float32)
        for dy in (0, 1):
            for dz in (0, 1):
                ci = dx * 4 + dy * 2 + dz
                e = jax.lax.dot_general(
                    p3,
                    sel_ref[ci],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (ny, nz, C)
                if dy:
                    e = jnp.pad(e[: ny - 1], ((1, 0), (0, 0), (0, 0)))
                if dz:
                    e = jnp.pad(e[:, : nz - 1], ((0, 0), (1, 0), (0, 0)))
                acc = acc + e
        return acc

    acc = plane_contrib(cur_ref[...], 0)
    # dx=1 corners come from plane x-1; at x == 0 there is none
    prev_scale = jnp.where(x > 0, 1.0, 0.0).astype(jnp.float32)
    acc = acc + prev_scale * plane_contrib(prev_ref[...], 1)
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("grid_shape", "interpret"))
def cell_stencil_pallas(
    cells: jnp.ndarray, grid_shape, interpret: bool = False
) -> jnp.ndarray:
    """Convert a (nvox, 8C) cell-corner buffer to the (nx, ny, nz, C) grid
    gradient in one pass (see module docstring).

    Args:
        cells: (nx*ny*nz, 8*C) scatter output, x-major voxel order.
        grid_shape: static (nx, ny, nz, C).

    Returns:
        (nx, ny, nz, C) gradient.
    """
    nx, ny, nz, C = grid_shape
    row = 8 * C
    planes = cells.reshape(nx * ny, nz, row)
    sel = jnp.asarray(_selectors(C))

    kern = functools.partial(_kernel, ny, nz, C)
    out = pl.pallas_call(
        kern,
        grid=(nx,),
        in_specs=[
            pl.BlockSpec((ny, nz, row), lambda i: (i, 0, 0)),
            # same array, shifted one x-plane back (clamped at 0; the kernel
            # zeroes the contribution at x == 0)
            pl.BlockSpec((ny, nz, row), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
            pl.BlockSpec(sel.shape, lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((ny, nz, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx * ny, nz, C), jnp.float32),
        interpret=interpret,
        # two double-buffered wide input planes exceed the default 16 MB
        # scoped-vmem stack; the chip has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(planes, planes, sel)
    return out.reshape(nx, ny, nz, C)
