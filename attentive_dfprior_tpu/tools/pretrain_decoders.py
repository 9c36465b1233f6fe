"""Pretrain the low/high occupancy decoders on procedural scenes.

The reference loads ConvONet-pretrained low/high decoders from
``pretrained/low_high.pt`` and freezes them during SLAM
(ref: src/DF_Prior.py:197-218, configs/df_prior.yaml:45 fix_high). That blob
is not shipped; this tool produces an equivalent prior from scratch: the
decoders are trained jointly with per-scene feature grids to regress
occupancy (+-1 inside/outside) of randomized procedural rooms, so they learn
a generic grid-feature -> occupancy mapping that transfers across scenes.

Transfer design: with few scenes in a fixed coordinate frame the decoders
can memorize geometry through the Fourier position embedding and ignore the
grid features entirely — frozen at SLAM time such decoders give the grids no
gradient. To force feature-dependence every scene gets a random world scale
and offset (coordinate ranges like real scenes, up to several meters), so
position alone carries no information and occupancy must be read from the
features.

The whole training loop is one jit-compiled ``lax.scan`` over steps (scene
geometry is stacked into arrays and indexed on device).

Output: ``pretrained/low_high.npz`` — loaded automatically when
``pretrained_decoders.low_high`` points at it (models/scene.py, with a
.pt -> .npz fallback in slam/system.py), restoring the reference's freeze
semantics (fix_high stays on).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from attentive_dfprior_tpu.models.decoders import (
    init_mlp_decoder,
    mlp_decoder_forward,
)
from attentive_dfprior_tpu.ops.adam import adam_init, adam_update
from attentive_dfprior_tpu.ops.grid_sample import sample_feature_grid

N_OBJ = 8


def sample_scene_geometry(key: jax.Array, scenes: int) -> Dict[str, jnp.ndarray]:
    """Random boxes+spheres per scene, in unit-room coordinates, plus a
    random world transform (scale in [1, 4], offset in [-3, 3]) per scene."""
    ks = jax.random.split(key, 6)
    return {
        "centers": jax.random.uniform(ks[0], (scenes, N_OBJ, 3), minval=-0.6, maxval=0.6),
        "radii": jax.random.uniform(ks[1], (scenes, N_OBJ), minval=0.1, maxval=0.3),
        "halves": jax.random.uniform(ks[2], (scenes, N_OBJ, 3), minval=0.08, maxval=0.3),
        "is_box": jax.random.bernoulli(ks[3], 0.5, (scenes, N_OBJ)),
        "scale": jax.random.uniform(ks[4], (scenes,), minval=1.0, maxval=4.0),
        "offset": jax.random.uniform(ks[5], (scenes, 3), minval=-3.0, maxval=3.0),
    }


def scene_sdf_unit(geom_s: Dict[str, jnp.ndarray], p_unit: jnp.ndarray) -> jnp.ndarray:
    """SDF of one scene at unit-room points. geom_s: per-scene slices."""
    room = 1.0 - jnp.max(jnp.abs(p_unit), axis=-1)  # (N,)
    diff = p_unit[:, None, :] - geom_s["centers"][None]  # (N, O, 3)
    sph = jnp.linalg.norm(diff, axis=-1) - geom_s["radii"][None]  # (N, O)
    q = jnp.abs(diff) - geom_s["halves"][None]
    box = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1) + jnp.minimum(
        jnp.max(q, axis=-1), 0.0
    )
    obj = jnp.where(geom_s["is_box"][None], box, sph)  # (N, O)
    return jnp.minimum(room, jnp.min(obj, axis=-1))


def pretrain(
    out_path: str = "pretrained/low_high.npz",
    steps: int = 6000,
    scenes: int = 32,
    grid_res: int = 24,
    c_dim: int = 32,
    batch: int = 8192,
    lr: float = 1e-3,
    seed: int = 0,
    verbose: bool = True,
) -> str:
    key = jax.random.PRNGKey(seed)
    key, kl, kh, kgeom = jax.random.split(key, 4)
    low_dec = init_mlp_decoder(kl, c_dim=c_dim, color=False)
    high_dec = init_mlp_decoder(kh, c_dim=2 * c_dim, color=False)

    geom = sample_scene_geometry(kgeom, scenes)
    gl = grid_res // 2

    # per-scene grids (trained jointly, discarded afterwards)
    key, kg1, kg2 = jax.random.split(key, 3)
    params = {
        "low": low_dec,
        "high": high_dec,
        "grids_low": jax.random.normal(kg1, (scenes, gl, gl, gl, c_dim)) * 0.01,
        "grids_high": jax.random.normal(kg2, (scenes, grid_res, grid_res, grid_res, c_dim)) * 0.01,
    }
    state = adam_init(params)
    lr_tree = jax.tree_util.tree_map(lambda _: lr, params)

    def loss_fn(params, pts, targets, bound, sidx, knoise):
        gl_ = params["grids_low"][sidx]
        gh_ = params["grids_high"][sidx]
        c_low = sample_feature_grid(gl_, pts, bound)
        c_high = jnp.concatenate(
            [sample_feature_grid(gh_, pts, bound), jax.lax.stop_gradient(c_low)],
            axis=-1,
        )
        # Feature-noise augmentation: SLAM optimizes the grids with Adam at
        # lr up to 0.5 per step (low_lr 0.1 x lr_first_factor 5,
        # configs/df_prior.yaml) — the frozen decoders must respond smoothly
        # to feature perturbations of that scale or the first mapping step
        # blows the occupancy field past sigmoid(10x) f32 saturation
        # (near-plane trap: every ray terminates at its first sample and all
        # gradients die). Training under noise bounds the feature Jacobian
        # in random directions at exactly that perturbation scale.
        k1, k2 = jax.random.split(knoise)
        c_low_in = c_low + 0.5 * jax.random.normal(k1, c_low.shape)
        c_high_in = c_high + 0.5 * jax.random.normal(k2, c_high.shape)
        low_occ = mlp_decoder_forward(params["low"], pts, c_low_in)
        high_occ = mlp_decoder_forward(params["high"], pts, c_high_in)
        # low models coarse occupancy; high models the residual on top
        # (mirrors the DF composition low_occ + high_occ, ref decoder.py:326)
        l_low = jnp.mean(jnp.abs(low_occ - targets))
        l_sum = jnp.mean(jnp.abs((low_occ + high_occ) - targets))
        return l_low + l_sum

    def one_step(carry, k):
        params, state = carry
        ks, kp, knoise = jax.random.split(k, 3)
        sidx = jax.random.randint(ks, (), 0, scenes)
        scale = geom["scale"][sidx]
        offset = geom["offset"][sidx]
        # world-space bound of this scene: offset +- scale
        bound = jnp.stack([offset - scale, offset + scale], axis=-1)  # (3, 2)
        p_unit = jax.random.uniform(kp, (batch, 3), minval=-1.0, maxval=1.0)
        pts = p_unit * scale + offset  # world coords fed to the decoders
        geom_s = jax.tree_util.tree_map(lambda a: a[sidx], geom)
        # smooth +-1 occupancy target (inside positive); SDF is measured in
        # unit-room coords so the target sharpness is scene-size invariant
        targets = jnp.tanh(-scene_sdf_unit(geom_s, p_unit) * 20.0)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, pts, targets, bound, sidx, knoise
        )
        params, state = adam_update(params, grads, state, lr_tree)
        return (params, state), loss

    @jax.jit
    def train(params, state, key):
        keys = jax.random.split(key, steps)
        (params, state), losses = jax.lax.scan(one_step, (params, state), keys)
        return params, losses

    key, kt = jax.random.split(key)
    params, losses = train(params, state, kt)
    losses = np.asarray(losses)
    if verbose:
        for it in range(0, steps, max(1, steps // 10)):
            print(f"step {it}: loss {losses[it]:.4f}")
        print(f"final loss {losses[-1]:.4f}")

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
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--scenes", type=int, default=32)
    args = ap.parse_args()
    pretrain(args.out, steps=args.steps, scenes=args.scenes)


if __name__ == "__main__":
    main()
