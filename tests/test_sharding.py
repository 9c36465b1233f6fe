"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

Validates the data-parallel mapping step (ray-sharded, replicated params,
XLA-inserted gradient psum) against the single-device result, and the driver
entry points in __graft_entry__.py."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    depth, var, color, att = out
    assert depth.shape == (256,)
    assert color.shape == (256, 3)
    assert np.isfinite(np.asarray(depth)).all()


def test_sharded_step_matches_single_device():
    """The dp-sharded step must produce the same loss/params as unsharded."""
    import __graft_entry__ as ge
    from attentive_dfprior_tpu.ops.adam import adam_init
    from attentive_dfprior_tpu.parallel.sharding import (
        make_mesh,
        replicate,
        shard_rays,
        sharded_mapping_step,
    )
    from attentive_dfprior_tpu.render.renderer import RenderConfig
    from attentive_dfprior_tpu.slam.mapper import StageLRs

    params, tsdf, tsdf_bnds, bound, _ = ge._tiny_scene()
    rcfg = RenderConfig(N_samples=8, N_surface=4)
    lrs = StageLRs(decoders=5e-3, mlp=5e-3, low=5e-3, high=5e-3, color=5e-3)

    R = 64
    key = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(key)
    rays_o = jax.random.uniform(k1, (R, 3), minval=-0.3, maxval=0.3)
    dirs = jax.random.normal(k2, (R, 3))
    rays_d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    gt_depth = jnp.full((R,), 0.8)
    gt_color = jnp.full((R, 3), 0.5)
    inside = jnp.ones((R,), dtype=bool)

    args = (rays_o, rays_d, gt_depth, gt_color, inside)

    # single device
    p1, a1, loss1 = sharded_mapping_step(
        jax.tree_util.tree_map(jnp.copy, params),
        adam_init(params), *args,
        tsdf, tsdf_bnds, bound, lrs, "color", rcfg, (False, False), 0.2,
    )

    # 8-device mesh
    mesh = make_mesh(jax.devices()[:8])
    pr = replicate(mesh, jax.tree_util.tree_map(jnp.copy, params))
    ar = replicate(mesh, adam_init(params))
    sharded_args = shard_rays(mesh, *args)
    p8, a8, loss8 = sharded_mapping_step(
        pr, ar, *sharded_args,
        replicate(mesh, tsdf), tsdf_bnds, bound, lrs, "color", rcfg,
        (False, False), 0.2,
    )

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    # parameters after the update must agree (gradient psum correctness)
    l1 = jax.tree_util.tree_leaves(p1)
    l8 = jax.tree_util.tree_leaves(p8)
    for x, y in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-4, atol=1e-6)
