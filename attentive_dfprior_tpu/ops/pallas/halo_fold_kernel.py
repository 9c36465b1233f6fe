"""Halo-blocked single-read bit-fold stencil — Pallas grid-gradient kernel.

Second half of the cell-scatter trilinear VJP (ops/grid_sample.py): turns
the (nvox, 8C) cell-corner buffer into the (nx, ny, nz, C) grid gradient

    grad[x,y,z,c] = sum_{cx,cy,cz in {0,1}} cells[x-cx, y-cy, z-cz,
                                                  corner(cx,cy,cz), c]

in ONE pass over the buffer. Two ideas over the round-4 attempt
(ops/pallas/stencil_kernel.py, measured SLOWER than XLA):

1. **Axis bit-fold instead of 8 corner extractions.** The corner index is
   (cx, cy, cz)-lexicographic inside the wide row, so the stencil
   factorizes into one shifted add per axis, each halving the column
   count (8C -> 4C -> 2C -> C). No corner-major transpose, no one-hot MXU
   matmuls, and the per-block compute touches 8C+4C+2C columns instead of
   8 x 8C.
2. **Multi-plane halo blocks.** The grid walks x in BX-plane blocks; the
   dx=1 corners of a block's first output plane come from ONE extra halo
   plane, bound as a second 1-plane BlockSpec of the same array — so the
   HBM read amplification is (1 + 1/BX), not the 2x of round 4's
   cur/prev double binding, and BX-plane blocks amortize the per-step
   pipeline overhead that sank the 74-step per-plane kernel.

Numerics: pure adds; per-output sums reassociate (x-pair first) relative
to the XLA corner-order sum, so parity vs _cell_stencil_grid_grad is
float32-roundoff, pinned in tests/test_pallas_kernels.py.

KNOWN ISSUE (2026-08-21): one specific non-production graph — the FULL
mapping iteration over a giant plain (X,Y,Z) TSDF volume (196M voxels,
width-1-row gathers) — reproducibly faults the chip when it contains this
kernel, while the production TSDFRows graphs are stable (verified
repeatedly, incl. under 8 GB HBM ballast) and minimal big-temp+kernel
repros do not fault. Upstream XLA/Mosaic interaction; the legacy layout
row in scripts/profile_mapping.py pins itself to the pure-XLA bitfold VJP.
(Related finding, same day: materializing an extra ~1 GB inside the
training scan graph — e.g. an in-graph pad of the giant volume — faults
even WITHOUT this kernel, so the fault class is the graph, not the
kernel.) If a user graph ever hits this, set
DFPRIOR_TRILINEAR_VJP=bitfold (16.7 vs 15.1 ms/iter) or convert the
volume host-side with tsdf_to_rows as production does.

Reference counterpart being replaced: cuDNN grid_sample backward
(ref: src/conv_onet/models/decoder.py:168-175 uses F.grid_sample on the
feature grids; its autodiff scatter-add is the CUDA analogue).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(bx, ny, nz, C, cur_ref, halo_ref, out_ref):
    # Layout discipline: Mosaic cannot concat (pad) values that sit at a
    # sub-128 lane offset ("result/input offset mismatch on non-concat
    # dimension"), so the y/z folds never SLICE the lane dim — they keep
    # full 4C=128-lane width and bring the upper column half down with a
    # full-width circular lane roll (result[l] = v[l + half] for
    # l < half); lanes >= half carry meaningless sums that the final
    # offset-0 [..., :C] store slice discards. The only lane slices are at
    # offsets 0 and 4C=128 — both lane-tile-aligned for f32.
    i = pl.program_id(0)
    B = cur_ref[...]  # (bx, ny, nz, 8C)
    # dx=1 sources for output planes [1..bx) are block planes [0..bx-1);
    # plane 0's dx=1 source is the halo plane (garbage at i == 0, where the
    # index map clamps to plane 0 — zero it: there is no plane -1).
    hi = jnp.where(i > 0, halo_ref[..., 4 * C :], 0.0)
    prev_hi = jnp.concatenate([hi, B[: bx - 1, ..., 4 * C :]], axis=0)
    A1 = B[..., : 4 * C] + prev_hi  # (bx, ny, nz, 4C): cx folded
    # fold cy: valid in lanes [0, 2C)
    sy = jnp.pad(A1[:, : ny - 1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    A2 = A1 + pltpu.roll(sy, shift=2 * C, axis=3)  # roll -2C == +2C mod 4C
    # fold cz: valid in lanes [0, C)
    sz = jnp.pad(A2[:, :, : nz - 1], ((0, 0), (0, 0), (1, 0), (0, 0)))
    A3 = A2 + pltpu.roll(sz, shift=3 * C, axis=3)  # roll -C == +3C mod 4C
    out_ref[...] = A3[..., :C]


@functools.partial(
    jax.jit, static_argnames=("grid_shape", "bx", "interpret")
)
def cell_fold_halo(
    cells: jnp.ndarray, grid_shape, bx: int = 8, interpret: bool = False
) -> jnp.ndarray:
    """(nx*ny*nz, 8C) cell buffer -> (nx, ny, nz, C) grid gradient.

    Args:
        cells: scatter output, x-major voxel order (see _cell_scatter).
        grid_shape: static (nx, ny, nz, C).
        bx: x-planes per block (VMEM per block ~ 2*bx*ny*nz*8C*4 bytes
            double-buffered; bx=8 on the room0 high grid is ~40 MB of the
            chip's 128 MB VMEM).

    Returns:
        (nx, ny, nz, C) gradient.
    """
    nx, ny, nz, C = grid_shape
    bx = min(bx, nx)
    # VMEM guard: the doubled-width fused pair fold (C=64,
    # ops/grid_sample.py:trilinear_sample_pair) doubles block bytes; shrink
    # bx until the double-buffered cur block fits comfortably.
    while bx > 1 and bx * ny * nz * 8 * C * 4 > 24 * 1024 * 1024:
        bx //= 2
    B4 = cells.reshape(nx, ny, nz, 8 * C)
    kern = functools.partial(_kernel, bx, ny, nz, C)
    nblk = pl.cdiv(nx, bx)
    out = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((bx, ny, nz, 8 * C), lambda i: (i, 0, 0, 0)),
            # the same array, one plane back from the block start (clamped
            # at plane 0; the kernel zeroes that block's halo contribution)
            pl.BlockSpec(
                (1, ny, nz, 8 * C),
                lambda i: (jnp.maximum(i * bx - 1, 0), 0, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((bx, ny, nz, C), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz, C), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(B4, B4)
    return out
