"""Per-group Adam on pytrees with gradient masking.

The reference builds a fresh ``torch.optim.Adam`` with 5 parameter groups for
every mapped frame and mutates each group's lr per optimization stage
(ref: src/Mapper.py:374-401). Because the optimizer state is reset per frame,
full-pytree Adam with zero-masked gradients is *exactly* equivalent to the
reference's masked-subset optimization (moments stay zero where grads are
zero), which lets us keep static shapes on TPU instead of gather/scatter of a
boolean-masked parameter subset (ref: src/Mapper.py:344-361, 476-482).

Learning rates are supplied per-leaf as a pytree of scalars (traced values are
fine), so stage-dependent LR schedules are plain jit arguments.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    m: Any  # first-moment pytree (like params)
    v: Any  # second-moment pytree (like params)


def adam_init(params: Any) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(step=jnp.zeros((), jnp.int32), m=zeros,
                     v=jax.tree_util.tree_map(jnp.zeros_like, params))


def adam_update(
    params: Any,
    grads: Any,
    state: AdamState,
    lr_tree: Any,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """One Adam step (torch.optim.Adam semantics: bias-corrected, eps after
    sqrt).

    Args:
        params / grads: matching pytrees.
        state: AdamState.
        lr_tree: pytree matching params whose leaves are scalar learning
            rates (may be traced; 0 freezes a leaf).

    Returns:
        (new_params, new_state)
    """
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t

    new_m = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.m, grads)
    new_v = jax.tree_util.tree_map(
        lambda v, g: b2 * v + (1 - b2) * (g * g), state.v, grads
    )

    def upd(p, m, v, lr):
        mhat = m / bc1
        vhat = v / bc2
        return p - lr * mhat / (jnp.sqrt(vhat) + eps)

    new_params = jax.tree_util.tree_map(upd, params, new_m, new_v, lr_tree)
    return new_params, AdamState(step=step, m=new_m, v=new_v)
