"""Fused decoder-MLP forward as a Pallas TPU kernel.

The grid-conditioned coordinate MLP (models/decoders.py:mlp_decoder_forward)
is the per-point hot op of the renderer: Fourier embed (3 -> 93), five
32-wide blocks with per-block feature injection and a skip concat, and an
output head. XLA executes it as a chain of small HBM-roundtrip ops; this
kernel keeps the whole block pipeline in VMEM: one block of points is
embedded and pushed through all layers without touching HBM, with the MXU
doing the (block, 93) x (93, 32) and (block, 32) x (32, 32) matmuls.

Weights are packed into a single (TOTAL_W, HIDDEN) matrix + bias bundle so
the kernel takes 4 refs regardless of depth. Layout (see pack_mlp_params):
rows [0:93]        W0 (embed -> h)
rows [93:93+c]     fc_c[0]
rows ...           per-block W_i | fc_c[i] pairs (skip block W3 has 125 rows)
output head passed separately (HIDDEN x 4; occ-only decoders use col 0).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

EMBED = 93
HIDDEN = 32
N_BLOCKS = 5
SKIPS = (2,)


def pack_mlp_params(params: Dict[str, Any]) -> Tuple[jnp.ndarray, ...]:
    """Pack a decoder pytree (models/decoders.py layout) for the kernel.

    Returns:
        B: (3, EMBED) fourier projection
        Wcat: (sum rows, HIDDEN) all pts_linears + fc_c weights stacked
        bcat: (2 * N_BLOCKS, HIDDEN) biases (pts bias row, fc bias row) pairs
        Wout: (HIDDEN, out_dim), bout: (out_dim,)
    """
    rows = []
    biases = []
    for i in range(N_BLOCKS):
        rows.append(params["pts"][i]["w"])
        biases.append(params["pts"][i]["b"])
        rows.append(params["fc_c"][i]["w"])
        biases.append(params["fc_c"][i]["b"])
    Wcat = jnp.concatenate(rows, axis=0)
    bcat = jnp.stack(biases, axis=0)
    return (
        params["B"],
        Wcat,
        bcat,
        params["out"]["w"],
        params["out"]["b"],
    )


def _row_offsets(c_dim: int):
    offs = []
    cur = 0
    for i in range(N_BLOCKS):
        w_rows = EMBED if i == 0 else (HIDDEN + EMBED if i - 1 in SKIPS else HIDDEN)
        offs.append((cur, w_rows))
        cur += w_rows
        offs.append((cur, c_dim))
        cur += c_dim
    return offs, cur


def _kernel(c_dim, p_ref, c_ref, B_ref, W_ref, b_ref, Wo_ref, bo_ref, out_ref):
    p = p_ref[:]  # (BLK, 3)
    c = c_ref[:]  # (BLK, c_dim)
    e = jnp.sin(
        jax.lax.dot_general(
            p, B_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    )
    offs, _ = _row_offsets(c_dim)
    h = e
    for i in range(N_BLOCKS):
        w_off, w_rows = offs[2 * i]
        f_off, f_rows = offs[2 * i + 1]
        W = W_ref[w_off : w_off + w_rows, :]
        fcW = W_ref[f_off : f_off + f_rows, :]
        hb = b_ref[2 * i, :]
        fb = b_ref[2 * i + 1, :]
        h = jnp.maximum(
            jax.lax.dot_general(
                h, W, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            + hb[None, :],
            0.0,
        )
        h = h + (
            jax.lax.dot_general(
                c, fcW, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            + fb[None, :]
        )
        if i in SKIPS:
            h = jnp.concatenate([e, h], axis=-1)
    out_ref[:] = (
        jax.lax.dot_general(
            h, Wo_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        + bo_ref[:][None, :]
    )


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def fused_mlp_forward(
    packed: Tuple[jnp.ndarray, ...],
    p: jnp.ndarray,
    c: jnp.ndarray,
    block: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused decoder MLP over N points.

    Args:
        packed: pack_mlp_params output.
        p: (N, 3) points; c: (N, c_dim) sampled grid features. N is padded to
            a block multiple internally.
        interpret: run the Pallas interpreter (for CPU tests).

    Returns:
        (N, out_dim) head outputs.
    """
    B, Wcat, bcat, Wout, bout = packed
    c_dim = c.shape[-1]
    out_dim = Wout.shape[-1]
    n = p.shape[0]
    n_pad = ((n + block - 1) // block) * block
    p_pad = jnp.pad(p, ((0, n_pad - n), (0, 0)))
    c_pad = jnp.pad(c, ((0, n_pad - n), (0, 0)))

    kern = functools.partial(_kernel, c_dim)
    out = pl.pallas_call(
        kern,
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((block, 3), lambda i: (i, 0)),
            pl.BlockSpec((block, c_dim), lambda i: (i, 0)),
            pl.BlockSpec(B.shape, lambda i: (0, 0)),
            pl.BlockSpec(Wcat.shape, lambda i: (0, 0)),
            pl.BlockSpec(bcat.shape, lambda i: (0, 0)),
            pl.BlockSpec(Wout.shape, lambda i: (0, 0)),
            pl.BlockSpec(bout.shape, lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block, out_dim), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_dim), jnp.float32),
        interpret=interpret,
    )(p_pad, c_pad, B, Wcat, bcat, Wout, bout)
    return out[:n]
