"""Multi-chip scaling: ray-axis data parallelism over a device mesh.

The reference is strictly single-GPU (SURVEY §2.3); this module is the
framework's scale-out design, following the standard JAX recipe: pick a mesh,
annotate shardings, let XLA insert the collectives.

Strategy (matches BASELINE.json's north star):
  - the ray/pixel batch axis is sharded across the ``dp`` mesh axis,
  - feature grids + decoder params are replicated,
  - the scalar loss / parameter gradients are combined by the psum XLA
    inserts when reducing over the sharded axis (riding ICI),
  - tracking's 7-DoF pose optimization uses the same scheme — each chip
    renders its ray shard and the pose gradient is psum'd.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from attentive_dfprior_tpu.camera import Camera
from attentive_dfprior_tpu.ops.adam import adam_update
from attentive_dfprior_tpu.render.renderer import RenderConfig
from attentive_dfprior_tpu.slam.mapper import StageLRs, build_lr_tree, mapping_loss_fn


def make_mesh(devices: Optional[Sequence] = None, axis: str = "dp") -> Mesh:
    """1-D device mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


def mesh_from_config(cfg) -> Optional[Mesh]:
    """Build the data-parallel mesh from the ``parallel`` config section.

    Config surface (configs/df_prior.yaml):
        parallel:
          enable: False      # turn on ray-axis data parallelism
          n_devices: -1      # -1 = all local devices
          multihost: False   # call jax.distributed.initialize (run.py)

    Returns None when parallelism is disabled or only one device would be
    used (the single-device path needs no sharding constraints).
    """
    p = cfg.get("parallel", {}) if cfg else {}
    if not p or not bool(p.get("enable", False)):
        return None
    n = int(p.get("n_devices", -1))
    devices = jax.devices()
    if n > 0:
        if n > len(devices):
            raise ValueError(
                f"parallel.n_devices={n} but only {len(devices)} devices visible"
            )
        devices = devices[:n]
    if len(devices) < 2:
        return None
    return make_mesh(devices)


def split_meshes_from_config(cfg) -> Optional[Tuple[Mesh, Mesh]]:
    """Disjoint mapper/tracker device meshes from ``parallel.split``.

    Config surface:
        parallel:
          enable: True
          split: {map: 6, track: 2}   # disjoint device subsets

    The async (loose/free) modes' reason to exist is multi-chip overlap:
    with ONE mesh the mapper worker thread and the tracker serialize on the
    same devices (measured, ASYNC_r04 — loose ~= strict on a single chip).
    A split assigns the mapper the first ``map`` devices and the tracker
    the next ``track``, so the two agents' device work genuinely overlaps.
    The published scene snapshot becomes a cross-mesh device_put (replicated
    onto the tracker's devices) instead of a same-device copy.

    Returns (map_mesh, track_mesh), or None when not configured.
    """
    p = cfg.get("parallel", {}) if cfg else {}
    split = p.get("split")
    if not p or not bool(p.get("enable", False)) or not split:
        return None
    k = int(split.get("map", 0))
    m = int(split.get("track", 0))
    if k < 1 or m < 1:
        raise ValueError(f"parallel.split needs map>=1 and track>=1, got {split}")
    devices = jax.devices()
    if k + m > len(devices):
        raise ValueError(
            f"parallel.split map={k}+track={m} exceeds {len(devices)} devices"
        )
    return make_mesh(devices[:k]), make_mesh(devices[k : k + m])


def ray_sharding(mesh: Optional[Mesh], axis: str = "dp") -> Optional[NamedSharding]:
    """NamedSharding that splits the leading (ray) axis across the mesh."""
    if mesh is None:
        return None
    return NamedSharding(mesh, P(axis))


def constrain_rays(sharding: Optional[NamedSharding], *arrays):
    """Inside-jit sharding constraint on ray-batch arrays (leading axis).

    This is the production hook: mapping/tracking steps call it on the
    per-iteration ray batch, making XLA shard the render + backward over
    the dp axis and insert the gradient psum automatically. No-op when
    sharding is None (single-device path compiles unchanged).
    """
    if sharding is None:
        return arrays[0] if len(arrays) == 1 else arrays
    out = tuple(jax.lax.with_sharding_constraint(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out


def shard_rays(mesh: Mesh, *arrays, axis: str = "dp"):
    """Place ray-batch arrays sharded along their leading axis."""
    sh = NamedSharding(mesh, P(axis))
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate(mesh: Mesh, tree: Any):
    """Fully replicate a pytree across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


@functools.partial(
    jax.jit,
    static_argnames=("stage", "rcfg", "fix_flags", "w_color_loss"),
    donate_argnums=(0, 1),
)
def sharded_mapping_step(
    params: Any,
    adam_state: Any,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    gt_depth: jnp.ndarray,
    gt_color: jnp.ndarray,
    inside_mask: jnp.ndarray,
    tsdf_volume: jnp.ndarray,
    tsdf_bnds: jnp.ndarray,
    bound: jnp.ndarray,
    lrs: StageLRs,
    stage: str,
    rcfg: RenderConfig,
    fix_flags: Tuple[bool, bool],
    w_color_loss: float,
):
    """One data-parallel mapping optimization step.

    Inputs arrive sharded over the ray axis (see ``shard_rays``); params are
    replicated. jax.grad of the sum-loss over sharded rays makes XLA insert
    the gradient all-reduce automatically — no explicit collectives needed.

    Returns (params, adam_state, loss).
    """
    from attentive_dfprior_tpu.models.scene import SceneConfig

    fix_high, fix_color = fix_flags
    scfg = SceneConfig(
        bound=np.zeros((3, 2)), c_dim=0, low_grid_len=0, high_grid_len=0,
        color_grid_len=0, fix_high=fix_high, fix_color=fix_color,
    )
    lr_tree = build_lr_tree(params, lrs, scfg)
    w_reg = jnp.asarray(0.0)
    loss, grads = jax.value_and_grad(mapping_loss_fn)(
        params, rays_o, rays_d, gt_depth, gt_color, inside_mask,
        tsdf_volume, tsdf_bnds, bound, stage, rcfg, w_color_loss, w_reg,
    )
    params, adam_state = adam_update(params, grads, adam_state, lr_tree)
    return params, adam_state, loss
