"""Pretrain the low/high occupancy decoders on procedural scenes.

The reference loads ConvONet-pretrained low/high decoders from
``pretrained/low_high.pt`` and freezes them during SLAM
(ref: src/DF_Prior.py:197-218, configs/df_prior.yaml:45 fix_high). That blob
is not shipped; this tool produces an equivalent prior from scratch: the
decoders are trained jointly with per-scene feature grids to regress
occupancy (+-1 inside/outside) of randomized procedural rooms, so they learn
a generic grid-feature -> occupancy mapping that transfers across scenes.

Output: ``pretrained/low_high.npz`` — loaded automatically when
``pretrained_decoders.low_high`` points at it (models/scene.py), restoring
the reference's freeze semantics (fix_high stays on).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from attentive_dfprior_tpu.models.decoders import (
    init_mlp_decoder,
    mlp_decoder_forward,
)
from attentive_dfprior_tpu.ops.adam import adam_init, adam_update
from attentive_dfprior_tpu.ops.grid_sample import sample_feature_grid


def random_scene_sdf(key: jax.Array, n_obj: int = 6):
    """Random boxes+spheres in a unit room; returns a jit-able sdf(p) fn."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    centers = jax.random.uniform(k1, (n_obj, 3), minval=-0.6, maxval=0.6)
    radii = jax.random.uniform(k2, (n_obj,), minval=0.1, maxval=0.3)
    halves = jax.random.uniform(k3, (n_obj, 3), minval=0.08, maxval=0.3)
    is_box = jax.random.bernoulli(k4, 0.5, (n_obj,))

    def sdf(p):  # (N, 3) -> (N,)
        room = 1.0 - jnp.max(jnp.abs(p), axis=-1)  # inside-room distance
        d = room
        for i in range(n_obj):
            sph = jnp.linalg.norm(p - centers[i], axis=-1) - radii[i]
            q = jnp.abs(p - centers[i]) - halves[i]
            box = jnp.linalg.norm(jnp.maximum(q, 0), axis=-1) + jnp.minimum(
                jnp.max(q, axis=-1), 0.0
            )
            obj = jnp.where(is_box[i], box, sph)
            d = jnp.minimum(d, obj)
        return d

    return sdf


def pretrain(
    out_path: str = "pretrained/low_high.npz",
    steps: int = 2000,
    scenes: int = 8,
    grid_res: int = 24,
    c_dim: int = 32,
    batch: int = 4096,
    lr: float = 1e-3,
    seed: int = 0,
    verbose: bool = True,
) -> str:
    key = jax.random.PRNGKey(seed)
    key, kl, kh = jax.random.split(key, 3)
    low_dec = init_mlp_decoder(kl, c_dim=c_dim, color=False)
    high_dec = init_mlp_decoder(kh, c_dim=2 * c_dim, color=False)

    bound = jnp.asarray([[-1.0, 1.0]] * 3, jnp.float32)
    gl = grid_res // 2

    # per-scene grids (trained jointly, discarded afterwards)
    key, kg = jax.random.split(key)
    grids_low = jax.random.normal(kg, (scenes, gl, gl, gl, c_dim)) * 0.01
    key, kg = jax.random.split(key)
    grids_high = (
        jax.random.normal(kg, (scenes, grid_res, grid_res, grid_res, c_dim)) * 0.01
    )

    sdfs = []
    for s in range(scenes):
        key, ks = jax.random.split(key)
        sdfs.append(random_scene_sdf(ks))

    params = {
        "low": low_dec,
        "high": high_dec,
        "grids_low": grids_low,
        "grids_high": grids_high,
    }
    state = adam_init(params)
    lr_tree = jax.tree_util.tree_map(lambda _: lr, params)

    def occ_target(sdf_vals):
        # smooth +-1 occupancy target (inside positive), slope ~ decoder scale
        return jnp.tanh(-sdf_vals * 20.0)

    def loss_fn(params, pts, targets, sidx):
        gl_ = params["grids_low"][sidx]
        gh_ = params["grids_high"][sidx]
        c_low = sample_feature_grid(gl_, pts, bound)
        c_high = jnp.concatenate(
            [sample_feature_grid(gh_, pts, bound), jax.lax.stop_gradient(c_low)],
            axis=-1,
        )
        low_occ = mlp_decoder_forward(params["low"], pts, c_low)
        high_occ = mlp_decoder_forward(params["high"], pts, c_high)
        # low models coarse occupancy; high models the residual on top
        # (mirrors the DF composition low_occ + high_occ, ref decoder.py:326)
        l_low = jnp.mean(jnp.abs(low_occ - targets))
        l_sum = jnp.mean(jnp.abs((low_occ + high_occ) - targets))
        return l_low + l_sum

    @jax.jit
    def step(params, state, pts, targets, sidx):
        loss, grads = jax.value_and_grad(loss_fn)(params, pts, targets, sidx)
        params, state = adam_update(params, grads, state, lr_tree)
        return params, state, loss

    rng = np.random.default_rng(seed)
    for it in range(steps):
        sidx = int(rng.integers(scenes))
        pts_np = rng.uniform(-1, 1, (batch, 3)).astype(np.float32)
        pts = jnp.asarray(pts_np)
        targets = occ_target(sdfs[sidx](pts))
        params, state, loss = step(params, state, pts, targets, jnp.asarray(sidx))
        if verbose and it % 200 == 0:
            print(f"step {it}: loss {float(loss):.4f}")

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    flat_low, _ = jax.tree_util.tree_flatten(params["low"])
    flat_high, _ = jax.tree_util.tree_flatten(params["high"])
    payload = {f"low{i:03d}": np.asarray(x) for i, x in enumerate(flat_low)}
    payload.update({f"high{i:03d}": np.asarray(x) for i, x in enumerate(flat_high)})
    np.savez_compressed(out_path, **payload)
    if verbose:
        print(f"saved pretrained decoders to {out_path}")
    return out_path


def load_pretrained_npz(decoders: Dict, path: str) -> Dict:
    """Load an npz produced by ``pretrain`` into a decoder pytree."""
    data = np.load(path)
    out = dict(decoders)
    for name in ("low", "high"):
        flat, treedef = jax.tree_util.tree_flatten(decoders[name])
        leaves = [jnp.asarray(data[f"{name}{i:03d}"]) for i in range(len(flat))]
        out[name] = jax.tree_util.tree_unflatten(treedef, leaves)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="pretrained/low_high.npz")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--scenes", type=int, default=8)
    args = ap.parse_args()
    pretrain(args.out, steps=args.steps, scenes=args.scenes)


if __name__ == "__main__":
    main()
