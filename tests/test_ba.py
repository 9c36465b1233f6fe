"""Keyframe bundle adjustment (mapping.BA) — framework extension tests.

The reference's optimize_map keeps all window poses fixed
(ref: src/Mapper.py:262-484); mapping.BA jointly optimizes the window poses
with the scene (slam/mapper.py:mapping_stage ba path), anchored at the
oldest keyframe. These tests pin the mechanics on the tiny scene; the
quality effect is measured in ABLATE_TRACKING_r04.json.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def _setup():
    import __graft_entry__ as ge
    from attentive_dfprior_tpu.camera import Camera
    from attentive_dfprior_tpu.ops.adam import adam_init
    from attentive_dfprior_tpu.ops.pose import pose_tensor_from_matrix
    from attentive_dfprior_tpu.render.renderer import RenderConfig
    from attentive_dfprior_tpu.slam.mapper import StageLRs

    params, tsdf, tsdf_bnds, bound, _ = ge._tiny_scene()
    rcfg = RenderConfig(N_samples=8, N_surface=4)
    lrs = StageLRs(decoders=5e-3, mlp=5e-3, low=5e-3, high=5e-3, color=5e-3)
    cam = Camera(H=24, W=32, fx=24.0, fy=24.0, cx=15.5, cy=11.5)
    F = 3
    rng = np.random.default_rng(5)
    colors = jnp.asarray(rng.uniform(0, 1, (F, cam.H, cam.W, 3)), jnp.float32)
    depths = jnp.asarray(rng.uniform(0.4, 0.9, (F, cam.H, cam.W)), jnp.float32)
    poses = []
    for f in range(F):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0.02 * f, -0.01 * f, 0.3]
        poses.append(c2w)
    poses = np.stack(poses)
    pose_t = jnp.asarray(
        np.stack([pose_tensor_from_matrix(p) for p in poses]), jnp.float32
    )
    return (params, tsdf, tsdf_bnds, bound, rcfg, lrs, cam, colors, depths,
            poses, pose_t, adam_init)


def test_ba_stage_optimizes_unanchored_poses_only():
    from attentive_dfprior_tpu.slam.mapper import mapping_stage

    (params, tsdf, tsdf_bnds, bound, rcfg, lrs, cam, colors, depths,
     poses, pose_t, adam_init) = _setup()
    p0 = np.asarray(pose_t).copy()  # mapping_stage donates its inputs
    opt = {"scene": params, "pose": pose_t}
    pose_mask = jnp.asarray([0.0, 1.0, 1.0])
    keys = jax.random.split(jax.random.PRNGKey(6), 3)
    wf = jnp.zeros((3,), jnp.float32)
    new_opt, _, losses = mapping_stage(
        opt, adam_init(opt), colors, depths, jnp.asarray(poses),
        None, tsdf, tsdf_bnds, bound, keys, wf, lrs, "color",
        16, cam, rcfg, (False, False), 0.2, False, None, None, 1,
        True, pose_mask, jnp.float32(1e-3),
    )
    p1 = np.asarray(new_opt["pose"])
    assert np.array_equal(p0[0], p1[0]), "anchored pose moved"
    assert not np.array_equal(p0[1], p1[1]), "unanchored pose frozen"
    assert not np.array_equal(p0[2], p1[2]), "unanchored pose frozen"
    assert np.isfinite(np.asarray(losses)).all()
    for leaf in jax.tree_util.tree_leaves(new_opt["scene"]):
        assert np.isfinite(np.asarray(leaf)).all()


def test_ba_off_by_default_in_optimize_map():
    """mapping.BA default False -> optimize_map returns refined=None and the
    params tree is the plain scene tree (reference semantics)."""
    from attentive_dfprior_tpu.camera import Camera
    from attentive_dfprior_tpu.models.scene import SceneConfig
    from attentive_dfprior_tpu.render.renderer import RenderConfig
    from attentive_dfprior_tpu.slam.mapper import Mapper
    import __graft_entry__ as ge

    params, tsdf, tsdf_bnds, bound, scfg = ge._tiny_scene()
    cam = Camera(H=24, W=32, fx=24.0, fy=24.0, cx=15.5, cy=11.5)
    cfg = {"mapping": {
        "pixels": 48, "iters": 4, "iters_first": 4, "lr_factor": 1.0,
        "lr_first_factor": 1.0, "low_iter_ratio": 0.4, "high_iter_ratio": 0.6,
        "mapping_window_size": 4, "w_color_loss": 0.2,
        "frustum_feature_selection": False,
        "stage": {st: {"decoders_lr": 5e-3, "mlp_lr": 5e-3, "low_lr": 5e-3,
                       "high_lr": 5e-3, "color_lr": 5e-3}
                  for st in ("low", "high", "color")},
    }}
    m = Mapper(cfg, cam, scfg, RenderConfig(N_samples=8, N_surface=4),
               tsdf, np.asarray(bound))
    assert m.ba is False
    rng = np.random.default_rng(7)
    F = 3
    colors = jnp.asarray(rng.uniform(0, 1, (F, cam.H, cam.W, 3)), jnp.float32)
    depths = jnp.asarray(rng.uniform(0.4, 0.9, (F, cam.H, cam.W)), jnp.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    poses[:, 2, 3] = 0.3
    new_params, _, losses, refined = m.optimize_map(
        params, 4, 1.0, 2, colors, depths, poses, jax.random.PRNGKey(8)
    )
    assert refined is None
    assert set(new_params.keys()) == set(params.keys())


def test_ba_on_optimize_map_returns_refined_window():
    from attentive_dfprior_tpu.camera import Camera
    from attentive_dfprior_tpu.models.scene import SceneConfig
    from attentive_dfprior_tpu.render.renderer import RenderConfig
    from attentive_dfprior_tpu.slam.mapper import Mapper
    import __graft_entry__ as ge

    params, tsdf, tsdf_bnds, bound, scfg = ge._tiny_scene()
    cam = Camera(H=24, W=32, fx=24.0, fy=24.0, cx=15.5, cy=11.5)
    cfg = {"mapping": {
        "pixels": 48, "iters": 4, "iters_first": 4, "lr_factor": 1.0,
        "lr_first_factor": 1.0, "low_iter_ratio": 0.4, "high_iter_ratio": 0.6,
        "mapping_window_size": 4, "w_color_loss": 0.2,
        "frustum_feature_selection": False, "BA": True, "ba_cam_lr": 1e-3,
        "stage": {st: {"decoders_lr": 5e-3, "mlp_lr": 5e-3, "low_lr": 5e-3,
                       "high_lr": 5e-3, "color_lr": 5e-3}
                  for st in ("low", "high", "color")},
    }}
    m = Mapper(cfg, cam, scfg, RenderConfig(N_samples=8, N_surface=4),
               tsdf, np.asarray(bound))
    assert m.ba is True
    rng = np.random.default_rng(9)
    F = 3
    colors = jnp.asarray(rng.uniform(0, 1, (F, cam.H, cam.W, 3)), jnp.float32)
    depths = jnp.asarray(rng.uniform(0.4, 0.9, (F, cam.H, cam.W)), jnp.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    poses[:, 2, 3] = 0.3
    poses[1, 0, 3] = 0.05
    new_params, _, losses, refined = m.optimize_map(
        params, 4, 1.0, 2, colors, depths, poses, jax.random.PRNGKey(8),
        ba_anchor=0,
    )
    assert refined is not None and refined.shape == (F, 4, 4)
    np.testing.assert_allclose(refined[0], poses[0], atol=1e-6)  # anchor
    assert not np.allclose(refined[-1], poses[-1])  # current refined
    # rotation part stays orthonormal (quaternion parameterization)
    R = refined[1][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_clamp_pose_update_bounds_delta():
    from attentive_dfprior_tpu.ops.pose import clamp_pose_update

    orig = np.eye(4, dtype=np.float32)
    new = np.eye(4, dtype=np.float32)
    new[:3, 3] = [0.3, 0.0, 0.0]  # 30 cm jump
    th = np.deg2rad(20.0)
    new[:3, :3] = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    out = clamp_pose_update(orig, new, max_dt=0.02, max_rot_rad=np.deg2rad(1.0))
    assert abs(np.linalg.norm(out[:3, 3]) - 0.02) < 1e-6
    dR = out[:3, :3]
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    assert abs(ang - np.deg2rad(1.0)) < 1e-5
    # same direction of correction
    assert out[0, 3] > 0
    # orthonormal
    np.testing.assert_allclose(dR @ dR.T, np.eye(3), atol=1e-6)

    # small updates pass through untouched
    small = np.eye(4, dtype=np.float32)
    small[:3, 3] = [0.005, 0.0, 0.0]
    out2 = clamp_pose_update(orig, small, 0.02, np.deg2rad(1.0))
    np.testing.assert_allclose(out2, small, atol=1e-7)
