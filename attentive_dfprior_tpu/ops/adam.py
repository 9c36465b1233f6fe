"""Per-group Adam on pytrees with gradient masking.

The reference builds a fresh ``torch.optim.Adam`` with 5 parameter groups for
every mapped frame and mutates each group's lr per optimization stage
(ref: src/Mapper.py:374-401). Two properties of torch.optim.Adam matter for
exact parity:

1. **Lazy per-parameter state init.** torch creates a parameter's Adam state
   at the first step where ``p.grad is not None`` — i.e. the first iteration
   whose loss graph actually touches it. Under the mapper's low->high->color
   stage schedule the attention MLP / high grid first get gradients at the
   first 'high' iteration and the color decoder/grid at the first 'color'
   iteration, so their bias corrections run on their OWN step count, not the
   global iteration count. We reproduce this with a per-leaf step counter
   that only advances when the leaf's gradient is nonzero (in JAX, a leaf
   outside the loss graph gets an exactly-zero gradient — the one-to-one
   stand-in for torch's ``grad is None``). For leaves with nonzero gradients
   every iteration (the common case) this is identical to a global step.

2. **Masked-subset equivalence.** Because the optimizer state is reset per
   frame and Adam is elementwise, full-pytree Adam with zero-masked gradients
   is *exactly* equivalent to the reference's masked-subset optimization
   (moments stay zero where grads are zero, so masked elements never move),
   which lets us keep static shapes on TPU instead of gather/scatter of a
   boolean-masked parameter subset (ref: src/Mapper.py:344-361, 476-482).
   The per-leaf (not per-element) step counter matches torch here too: the
   reference's masked subset is one tensor whose state advances as a whole
   once any element has a gradient.

Both properties are pinned end-to-end by
tests/test_reference_parity_loops.py::test_optimize_map_loop_matches_reference.

Learning rates are supplied per-leaf as a pytree of scalars (traced values are
fine), so stage-dependent LR schedules are plain jit arguments.
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

# DFPRIOR_ADAM_LAZY=0 restores the pre-round-4 global step counter
# (diagnostic only; the lazy default is the torch-parity behavior, pinned by
# tests/test_reference_parity_loops.py). Read ONCE at import: adam_update is
# called inside jitted scans, so an in-body env read would be baked in at
# trace time anyway and silently ignore later flips — requiring a process
# restart makes that explicit. Documented with the other DFPRIOR_* switches
# in README.md.
_ADAM_LAZY = os.environ.get("DFPRIOR_ADAM_LAZY", "1") != "0"


class AdamState(NamedTuple):
    step: Any  # pytree of scalar int32 per-leaf step counts (like params)
    m: Any  # first-moment pytree (like params)
    v: Any  # second-moment pytree (like params)


def adam_init(params: Any) -> AdamState:
    return AdamState(
        step=jax.tree_util.tree_map(
            lambda _: jnp.zeros((), jnp.int32), params
        ),
        m=jax.tree_util.tree_map(jnp.zeros_like, params),
        v=jax.tree_util.tree_map(jnp.zeros_like, params),
    )


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
    sqrt, lazy per-leaf state init — see module docstring).

    Args:
        params / grads: matching pytrees.
        state: AdamState.
        lr_tree: pytree matching params whose leaves are scalar learning
            rates (may be traced; 0 freezes a leaf).

    Returns:
        (new_params, new_state)
    """
    # a leaf whose gradient is exactly zero everywhere was not in the loss
    # graph this iteration (torch: p.grad is None -> the leaf's step, moments
    # AND parameter are all untouched). The per-leaf `touched` indicator
    # gates all three, so the op matches torch for ANY gradient pattern —
    # including a touched-then-untouched leaf (torch freezes it; decaying
    # momentum and stepping would keep it moving) — not just the monotonic
    # low->high->color stage schedule the mapper happens to use.
    if _ADAM_LAZY:
        touched = jax.tree_util.tree_map(lambda g: jnp.any(g != 0), grads)
    else:
        touched = jax.tree_util.tree_map(
            lambda g: jnp.ones((), jnp.bool_), grads
        )
    new_step = jax.tree_util.tree_map(
        lambda s, t: s + t.astype(jnp.int32), state.step, touched
    )
    new_m = jax.tree_util.tree_map(
        lambda m, g, t: jnp.where(t, b1 * m + (1 - b1) * g, m),
        state.m, grads, touched,
    )
    new_v = jax.tree_util.tree_map(
        lambda v, g, t: jnp.where(t, b2 * v + (1 - b2) * (g * g), v),
        state.v, grads, touched,
    )

    def upd(p, m, v, lr, t, tch):
        tf = t.astype(jnp.float32)
        # at t == 0 (leaf never touched) m == v == 0; guard the 0/0
        bc1 = jnp.maximum(1.0 - b1**tf, jnp.float32(1e-12))
        bc2 = jnp.maximum(1.0 - b2**tf, jnp.float32(1e-12))
        mhat = m / bc1
        vhat = v / bc2
        return jnp.where(tch, p - lr * mhat / (jnp.sqrt(vhat) + eps), p)

    new_params = jax.tree_util.tree_map(
        upd, params, new_m, new_v, lr_tree, new_step, touched
    )
    return new_params, AdamState(step=new_step, m=new_m, v=new_v)
