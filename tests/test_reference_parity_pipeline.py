"""Full-pipeline numeric parity against the ACTUAL reference code.

Round-2 parity stopped at DF.forward / raw2outputs (tests/test_reference_parity.py);
a transcription drift in the composed sampling ladder (near/far computation,
stratified + surface-band z values, the d==0 ladder, sorting, the out-of-bound
occupancy wall) or in the optimizer step would have been invisible (VERDICT
round 2, Missing #1 / Next #3). These tests import the reference's own
Renderer and common modules from /root/reference (CPU-retargeted device
strings only), load IDENTICAL weights through the converter, and assert under
perturb=0 (deterministic):

  - Renderer.render_batch_ray == render.renderer.render_rays on all three
    stages — depth / uncertainty / color / attention weights — including
    rays with gt_depth == 0 (the uniform-ladder branch,
    ref: src/utils/Renderer.py:163-201) and the gt_depth=None branch
    (ref: src/utils/Renderer.py:140-162)
  - d(tracking loss)/d(camera_tensor) through the WHOLE chain
    get_camera_from_tensor -> get_rays_from_uv -> render_batch_ray -> robust
    loss (ref: src/Tracker.py:75-134, src/common.py:139-178) vs our
    ops.pose.pose_matrix_from_tensor -> ops.rays.get_rays_from_uv ->
    render_rays, on all three stages
  - ops.adam.adam_update == torch.optim.Adam step-for-step on identical
    recorded gradients with per-group LRs mutated mid-run, exactly as the
    mapper does per stage (ref: src/Mapper.py:374-401, src/Tracker.py:213-224)
"""

import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount not available"
)

import jax
import jax.numpy as jnp

from attentive_dfprior_tpu.ops.adam import adam_init, adam_update
from attentive_dfprior_tpu.ops.pose import pose_matrix_from_tensor
from attentive_dfprior_tpu.ops.rays import get_rays_from_uv
from attentive_dfprior_tpu.render.renderer import RenderConfig, render_rays
from tests.test_reference_parity import BOUND, build_pair

RCFG = RenderConfig(N_samples=32, N_surface=16, N_importance=0, perturb=0.0)


def _load_ref_common_cpu():
    """Import the reference src/common.py with the one CUDA-only idiom
    retargeted: quad2rotation allocates via ``.to(quad.get_device())``
    (src/common.py:152), which rejects CPU tensors (get_device() == -1).
    Every line of math is the reference's own."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    path = os.path.join(REF, "src/common.py")
    with open(path) as f:
        src = f.read()
    patched = src.replace(".to(quad.get_device())", ".to(quad.device)")
    assert patched != src, "expected the get_device idiom to patch"
    mod = types.ModuleType("ref_common_cpu")
    mod.__file__ = path
    exec(compile(patched, path, "exec"), mod.__dict__)
    return mod


@pytest.fixture(scope="module")
def stack():
    """Identical-weight (torch reference Renderer+DF, jax params) pair."""
    model, c_grid, tsdf_t, tsdf_bnds_t, params, tsdf_j = build_pair()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.utils.Renderer import Renderer as RefRenderer

    cfg = {
        "rendering": {
            "lindisp": False,
            "perturb": 0.0,
            "N_samples": RCFG.N_samples,
            "N_surface": RCFG.N_surface,
            "N_importance": RCFG.N_importance,
        },
        "scale": 1,
        "occupancy": True,
        "meshing": {"resolution": 256},
    }
    slam = SimpleNamespace(
        bound=torch.from_numpy(BOUND).float(),
        vol_bnds=tsdf_bnds_t,
        H=24, W=32, fx=30.0, fy=30.0, cx=15.5, cy=11.5,
    )
    ref_renderer = RefRenderer(cfg, None, slam)
    refc = _load_ref_common_cpu()
    return SimpleNamespace(
        model=model, c_grid=c_grid, tsdf_t=tsdf_t, tsdf_bnds_t=tsdf_bnds_t,
        params=params, tsdf_j=tsdf_j, ref_renderer=ref_renderer, refc=refc,
        slam=slam,
        bound_j=jnp.asarray(BOUND, jnp.float32),
    )


def _ray_batch(n=96, seed=11, zero_depth_frac=0.15):
    """Rays rooted inside the bound with a mix of zero and positive depths."""
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-0.1, 0.3, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    gd = rng.uniform(0.3, 0.9, (n,)).astype(np.float32)
    gd[rng.uniform(size=n) < zero_depth_frac] = 0.0
    gd[:2] = 0.0  # guarantee the d==0 uniform ladder fires
    return ro, rd, gd


@pytest.mark.parametrize("stage", ["low", "high", "color"])
def test_render_batch_ray_matches_reference(stack, stage):
    """Composed pipeline values: near/far + sampling ladder + point eval +
    occupancy wall + compositing (ref: src/utils/Renderer.py:110-255)."""
    ro, rd, gd = _ray_batch()
    d_t, u_t, c_t, w_t = stack.ref_renderer.render_batch_ray(
        stack.c_grid, stack.model, torch.from_numpy(rd), torch.from_numpy(ro),
        "cpu", stack.tsdf_t, stack.tsdf_bnds_t, stage,
        gt_depth=torch.from_numpy(gd),
    )
    d_j, u_j, c_j, w_j = render_rays(
        stack.params, jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(gd),
        stack.tsdf_j, stack.bound_j, stack.bound_j, stage, RCFG,
    )
    np.testing.assert_allclose(
        np.asarray(d_j), d_t.detach().numpy(), rtol=5e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(u_j), u_t.detach().numpy(), rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(c_j), c_t.detach().numpy(), rtol=5e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(w_j),
        w_t.detach().numpy().reshape(w_j.shape),
        rtol=5e-4, atol=5e-4,
    )


def test_render_batch_ray_no_gt_depth_matches_reference(stack):
    """The gt_depth=None branch: near=0.01, far=bound exit, no surface band
    (ref: src/utils/Renderer.py:140-162)."""
    ro, rd, _ = _ray_batch(seed=12)
    d_t, u_t, c_t, _ = stack.ref_renderer.render_batch_ray(
        stack.c_grid, stack.model, torch.from_numpy(rd), torch.from_numpy(ro),
        "cpu", stack.tsdf_t, stack.tsdf_bnds_t, "color", gt_depth=None,
    )
    d_j, u_j, c_j, _ = render_rays(
        stack.params, jnp.asarray(ro), jnp.asarray(rd),
        jnp.zeros((len(ro),), jnp.float32),
        stack.tsdf_j, stack.bound_j, stack.bound_j, "color", RCFG,
        no_gt_depth=True,
    )
    np.testing.assert_allclose(
        np.asarray(d_j), d_t.detach().numpy(), rtol=5e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(u_j), u_t.detach().numpy(), rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(c_j), c_t.detach().numpy(), rtol=5e-4, atol=5e-4
    )


@pytest.mark.parametrize("stage", ["low", "high", "color"])
def test_pose_gradient_matches_reference(stack, stage):
    """d(tracking loss)/d(camera_tensor) through the full chain
    (ref: src/Tracker.py:93-129 with handle_dynamic=False;
    quaternion->rotation: src/common.py:139-178)."""
    slam = stack.slam
    H, W, fx, fy, cx, cy = slam.H, slam.W, slam.fx, slam.fy, slam.cx, slam.cy
    rng = np.random.default_rng(13)
    n = 48
    i_np = rng.uniform(4, W - 5, (n,)).astype(np.float32)
    j_np = rng.uniform(4, H - 5, (n,)).astype(np.float32)
    gd_np = rng.uniform(0.3, 0.7, (n,)).astype(np.float32)
    gc_np = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    # pose: slight rotation + translation toward bound center, looking -z
    quad = np.array([0.99, 0.03, -0.02, 0.04], np.float32)
    quad /= np.linalg.norm(quad)
    cam_np = np.concatenate([quad, np.array([0.1, 0.15, 0.5], np.float32)])

    w_color = 0.5

    # ---- torch reference chain ----
    refc = stack.refc
    cam_t = torch.from_numpy(cam_np.copy()).requires_grad_(True)
    c2w_t = refc.get_camera_from_tensor(cam_t)
    ro_t, rd_t = refc.get_rays_from_uv(
        torch.from_numpy(i_np), torch.from_numpy(j_np), c2w_t,
        H, W, fx, fy, cx, cy, "cpu",
    )
    gd_t = torch.from_numpy(gd_np)
    d_t, u_t, c_t, _ = stack.ref_renderer.render_batch_ray(
        stack.c_grid, stack.model, rd_t, ro_t, "cpu",
        stack.tsdf_t, stack.tsdf_bnds_t, stage, gt_depth=gd_t,
    )
    u_t = u_t.detach()
    mask_t = gd_t > 0
    loss_t = (torch.abs(gd_t - d_t) / torch.sqrt(u_t + 1e-10))[mask_t].sum()
    loss_t = loss_t + w_color * torch.abs(
        torch.from_numpy(gc_np) - c_t
    )[mask_t].sum()
    loss_t.backward()
    g_ref = cam_t.grad.numpy()

    # ---- jax chain (ops.pose + ops.rays + render.renderer) ----
    def loss_fn(ct):
        c2w = pose_matrix_from_tensor(ct)
        ro, rd = get_rays_from_uv(
            jnp.asarray(i_np), jnp.asarray(j_np), c2w, fx, fy, cx, cy
        )
        d, u, c, _ = render_rays(
            stack.params, ro, rd, jnp.asarray(gd_np),
            stack.tsdf_j, stack.bound_j, stack.bound_j, stage, RCFG,
        )
        u = jax.lax.stop_gradient(u)
        mask = jnp.asarray(gd_np) > 0
        loss = jnp.sum(jnp.abs(jnp.asarray(gd_np) - d) / jnp.sqrt(u + 1e-10) * mask)
        return loss + w_color * jnp.sum(
            jnp.abs(jnp.asarray(gc_np) - c) * mask[:, None]
        )

    l_j, g_j = jax.value_and_grad(loss_fn)(jnp.asarray(cam_np))
    np.testing.assert_allclose(float(l_j), float(loss_t), rtol=1e-3)
    scale = np.abs(g_ref).max()
    assert scale > 0
    np.testing.assert_allclose(
        np.asarray(g_j) / scale, g_ref / scale, rtol=2e-3, atol=2e-4
    )


def _adam_case(lr_groups, n_steps, lr_switch=None):
    """Run our pytree Adam and torch.optim.Adam on identical params/grads.

    lr_groups: {leaf_name: lr}; lr_switch: (step, {leaf_name: new_lr}) —
    mirrors the mapper mutating param_group['lr'] per stage
    (ref: src/Mapper.py:403-423).
    """
    rng = np.random.default_rng(17)
    shapes = {"decoders": (33, 17), "grid": (6, 5, 4, 3), "pose": (7,)}
    init = {k: rng.normal(size=s).astype(np.float32) for k, s in shapes.items()}
    grads = [
        {k: rng.normal(size=s).astype(np.float32) for k, s in shapes.items()}
        for _ in range(n_steps)
    ]

    # torch
    tp = {k: torch.from_numpy(v.copy()).requires_grad_(True) for k, v in init.items()}
    opt = torch.optim.Adam(
        [{"params": [tp[k]], "lr": lr_groups[k]} for k in shapes]
    )
    first_step_torch = None
    for step, g in enumerate(grads):
        if lr_switch and step == lr_switch[0]:
            for gi, k in enumerate(shapes):
                opt.param_groups[gi]["lr"] = lr_switch[1][k]
        for k in shapes:
            tp[k].grad = torch.from_numpy(g[k].copy())
        opt.step()
        if step == 0:
            first_step_torch = {k: tp[k].detach().numpy().copy() for k in shapes}

    # ours
    jp = {k: jnp.asarray(v) for k, v in init.items()}
    state = adam_init(jp)
    lrs = dict(lr_groups)
    first_step_ours = None
    for step, g in enumerate(grads):
        if lr_switch and step == lr_switch[0]:
            lrs = dict(lr_switch[1])
        lr_tree = {k: jnp.float32(lrs[k]) for k in shapes}
        jp, state = adam_update(jp, {k: jnp.asarray(v) for k, v in g.items()}, state, lr_tree)
        if step == 0:
            first_step_ours = {k: np.asarray(v) for k, v in jp.items()}

    # step 1 at near-roundoff precision: bias-correction or lr drift shows
    # up here orders of magnitude above 1e-6 (eps placement is pinned by
    # test_adam_eps_regime below, where it is a ~10% effect)
    for k in shapes:
        np.testing.assert_allclose(
            first_step_ours[k], first_step_torch[k], rtol=1e-4, atol=1e-6,
            err_msg=f"{k} (single step)",
        )
    # after n_steps, identical-formula fp32 runs drift only by roundoff
    # (measured ~6e-4 max relative after 12 steps); semantic drift is
    # orders of magnitude larger
    for k in shapes:
        np.testing.assert_allclose(
            np.asarray(jp[k]), tp[k].detach().numpy(), rtol=2e-3, atol=1e-5,
            err_msg=k,
        )


def test_adam_matches_torch_per_group_lrs():
    """ops.adam == torch.optim.Adam on recorded gradients with per-group LRs
    (ref: src/Mapper.py:374-401 builds 5 groups; src/Tracker.py:213 one)."""
    _adam_case({"decoders": 1e-3, "grid": 5e-2, "pose": 1e-3}, n_steps=12)


def test_adam_eps_regime():
    """With gradient magnitudes ~1e-7, sqrt(v_hat) ~ eps, so torch's exact
    eps placement (added AFTER the sqrt, torch.optim.Adam docs) changes the
    step by ~10%; a variant with eps inside the sqrt or a different eps
    would fail this immediately."""
    rng = np.random.default_rng(23)
    p0 = rng.normal(size=(41,)).astype(np.float32)
    g = (rng.normal(size=(41,)) * 1e-7).astype(np.float32)

    tp = torch.from_numpy(p0.copy()).requires_grad_(True)
    opt = torch.optim.Adam([tp], lr=1e-3)
    tp.grad = torch.from_numpy(g.copy())
    opt.step()

    jp, _ = adam_update(
        {"p": jnp.asarray(p0)}, {"p": jnp.asarray(g)},
        adam_init({"p": jnp.asarray(p0)}), {"p": jnp.float32(1e-3)},
    )
    np.testing.assert_allclose(
        np.asarray(jp["p"]), tp.detach().numpy(), rtol=1e-5, atol=1e-8
    )


def test_adam_matches_torch_with_stage_lr_switch():
    """Mid-run LR mutation (the mapper's per-stage schedule,
    ref: src/Mapper.py:403-423) preserves step-for-step parity, including a
    group frozen at lr=0."""
    _adam_case(
        {"decoders": 0.0, "grid": 1e-2, "pose": 2e-3},
        n_steps=10,
        lr_switch=(5, {"decoders": 5e-3, "grid": 1e-3, "pose": 0.0}),
    )
