"""Unit tests for pose math, ray generation, compositing, PDF sampling, Adam.

Golden comparisons are against independent torch/numpy implementations of the
reference equations (ref: src/common.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from attentive_dfprior_tpu.ops.adam import adam_init, adam_update
from attentive_dfprior_tpu.ops.compositing import raw2outputs
from attentive_dfprior_tpu.ops.pose import (
    pose_matrix_from_tensor,
    pose_tensor_from_matrix,
    quat_to_rotation,
    rotation_to_quat,
)
from attentive_dfprior_tpu.ops.rays import (
    get_rays_from_uv,
    get_rays_full_image,
    ray_bound_intersection,
    sample_pdf,
)


def random_rotation(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y**2 + z**2), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x**2 + z**2), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x**2 + y**2)],
        ]
    )


class TestPose:
    def test_quat_rotation_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            R = random_rotation(rng)
            q = rotation_to_quat(R)
            R2 = np.asarray(quat_to_rotation(jnp.asarray(q[None])))[0]
            np.testing.assert_allclose(R2, R, atol=1e-6)

    def test_pose_tensor_roundtrip(self):
        rng = np.random.default_rng(1)
        RT = np.eye(4)
        RT[:3, :3] = random_rotation(rng)
        RT[:3, 3] = rng.standard_normal(3)
        t = pose_tensor_from_matrix(RT)
        RT2 = np.asarray(pose_matrix_from_tensor(jnp.asarray(t)))
        np.testing.assert_allclose(RT2, RT[:3], atol=1e-5)

    def test_nonunit_quat_still_valid_rotation(self):
        """The tracker optimizes unnormalized quats; R must stay orthonormal
        (the 2/|q|^2 normalization, ref: src/common.py:151)."""
        q = jnp.asarray([[2.0, 0.4, -0.3, 1.1]])
        R = np.asarray(quat_to_rotation(q))[0]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)

    def test_quat_gradients(self):
        t = jnp.asarray([1.0, 0.1, 0.2, 0.3, 1.0, 2.0, 3.0])
        g = jax.grad(lambda x: jnp.sum(pose_matrix_from_tensor(x)))(t)
        assert np.isfinite(np.asarray(g)).all()


class TestRays:
    def test_rays_match_torch_reference(self):
        """get_rays_from_uv equals the reference formula (src/common.py:76-91)."""
        rng = np.random.default_rng(2)
        H, W, fx, fy, cx, cy = 48, 64, 80.0, 82.0, 31.5, 23.5
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = random_rotation(rng).astype(np.float32)
        c2w[:3, 3] = rng.standard_normal(3).astype(np.float32)

        i = torch.tensor(rng.uniform(0, W - 1, 100), dtype=torch.float32)
        j = torch.tensor(rng.uniform(0, H - 1, 100), dtype=torch.float32)
        dirs = torch.stack([(i - cx) / fx, -(j - cy) / fy, -torch.ones_like(i)], -1)
        dirs = dirs.reshape(-1, 1, 3)
        rays_d_ref = torch.sum(dirs * torch.from_numpy(c2w[:3, :3]), -1).numpy()

        ro, rd = get_rays_from_uv(
            jnp.asarray(i.numpy()), jnp.asarray(j.numpy()), jnp.asarray(c2w), fx, fy, cx, cy
        )
        np.testing.assert_allclose(np.asarray(rd), rays_d_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ro), np.broadcast_to(c2w[:3, 3], (100, 3)), atol=1e-6
        )

    def test_full_image_rays_shape_and_center(self):
        c2w = jnp.eye(4)
        ro, rd = get_rays_full_image(10, 12, 10.0, 10.0, 5.5, 4.5, c2w)
        assert ro.shape == (10, 12, 3) and rd.shape == (10, 12, 3)
        # principal-point ray points straight down -z
        d = np.asarray(rd)[4, 5]  # j=4 -> y≈0.05; nearest pixel check
        assert d[2] == -1.0

    def test_bound_intersection(self):
        bound = jnp.asarray([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]])
        o = jnp.asarray([[0.0, 0.0, 0.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        t = ray_bound_intersection(o, d, bound)
        np.testing.assert_allclose(np.asarray(t), [1.0], atol=1e-6)

    def test_sample_pdf_deterministic(self):
        bins = jnp.asarray(np.linspace(0, 1, 9)[None].repeat(4, 0))
        w = jnp.asarray(np.ones((4, 8)))
        s = sample_pdf(jax.random.PRNGKey(0), bins, w, 16, det=True)
        assert s.shape == (4, 16)
        assert (np.diff(np.asarray(s), axis=-1) >= -1e-6).all()


class TestCompositing:
    def _torch_reference(self, raw, z_vals, rays_d):
        """raw2outputs_nerf_color occupancy branch (src/common.py:206-251)."""
        raw = torch.from_numpy(raw.copy())
        z_vals = torch.from_numpy(z_vals)
        alpha = torch.sigmoid(10 * raw[..., -1])
        weights = alpha.float() * torch.cumprod(
            torch.cat(
                [torch.ones((alpha.shape[0], 1)), (1.0 - alpha + 1e-10).float()], -1
            ),
            -1,
        )[:, :-1]
        rgb_map = torch.sum(weights[..., None] * raw[..., :-1], -2)
        depth_map = torch.sum(weights * z_vals, -1)
        tmp = z_vals - depth_map.unsqueeze(-1)
        depth_var = torch.sum(weights * tmp * tmp, dim=1)
        return (
            depth_map.numpy(),
            depth_var.numpy(),
            rgb_map.numpy(),
            weights.numpy(),
        )

    def test_occupancy_mode_matches_reference(self):
        rng = np.random.default_rng(3)
        R, S = 33, 48
        raw = rng.standard_normal((R, S, 4)).astype(np.float32)
        z_vals = np.sort(rng.uniform(0.1, 5.0, (R, S)).astype(np.float32), axis=-1)
        rays_d = rng.standard_normal((R, 3)).astype(np.float32)

        d_ref, v_ref, c_ref, w_ref = self._torch_reference(raw, z_vals, rays_d)
        d, v, c, w = raw2outputs(
            jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d), occupancy=True
        )
        np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v), v_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c), c_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-4, atol=1e-5)

    def test_opaque_sample_dominates(self):
        """occ=100 at one sample -> depth == that sample's z (the renderer's
        out-of-bound wall semantics)."""
        R, S = 1, 8
        raw = np.zeros((R, S, 4), np.float32)
        raw[..., 3] = -100.0
        raw[0, 3, 3] = 100.0
        z = np.linspace(1, 8, S, dtype=np.float32)[None]
        d, _, _, w = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.ones((1, 3)))
        np.testing.assert_allclose(np.asarray(d)[0], z[0, 3], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(w)[0, 3], 1.0, atol=1e-4)


class TestAdam:
    def test_matches_torch_adam(self):
        rng = np.random.default_rng(4)
        p0 = rng.standard_normal((5, 3)).astype(np.float32)

        tp = torch.tensor(p0, requires_grad=True)
        opt = torch.optim.Adam([tp], lr=0.01)
        params = {"p": jnp.asarray(p0)}
        state = adam_init(params)
        lr_tree = {"p": 0.01}

        for step in range(5):
            g = rng.standard_normal((5, 3)).astype(np.float32)
            opt.zero_grad()
            tp.grad = torch.tensor(g)
            opt.step()
            params, state = adam_update(params, {"p": jnp.asarray(g)}, state, lr_tree)

        np.testing.assert_allclose(
            np.asarray(params["p"]), tp.detach().numpy(), rtol=1e-5, atol=1e-6
        )

    def test_zero_grad_zero_update(self):
        """Masked (zero) grads leave params AND moments untouched — the
        property that makes full-grid Adam equal to the reference's
        masked-subset optimizer (src/Mapper.py:344-361)."""
        params = {"p": jnp.ones((4,))}
        state = adam_init(params)
        g = {"p": jnp.zeros((4,))}
        new_p, new_s = adam_update(params, g, state, {"p": 0.1})
        np.testing.assert_allclose(np.asarray(new_p["p"]), np.ones(4))
        np.testing.assert_allclose(np.asarray(new_s.m["p"]), np.zeros(4))


class TestMaskedLowerMedian:
    """torch.median convention parity for the tracker's dynamic-pixel cut
    (ref: src/Tracker.py:118-119): even counts take the LOWER middle order
    statistic, where numpy would average the middle pair."""

    def test_matches_torch_even_and_odd(self):
        import torch

        from attentive_dfprior_tpu.slam.tracker import masked_lower_median

        rng = np.random.default_rng(7)
        for n_valid in (1, 2, 5, 8, 47, 48):
            vals = rng.normal(size=64).astype(np.float32)
            mask = np.zeros(64, bool)
            mask[rng.choice(64, n_valid, replace=False)] = True
            ours = float(masked_lower_median(jnp.asarray(vals), jnp.asarray(mask)))
            ref = float(torch.from_numpy(vals[mask]).median())
            assert ours == ref, (n_valid, ours, ref)

    def test_even_count_differs_from_numpy_mean_convention(self):
        from attentive_dfprior_tpu.slam.tracker import masked_lower_median

        vals = jnp.asarray(np.array([1.0, 3.0], np.float32))
        mask = jnp.asarray(np.array([True, True]))
        assert float(masked_lower_median(vals, mask)) == 1.0  # not 2.0

    def test_empty_mask_is_inf(self):
        from attentive_dfprior_tpu.slam.tracker import masked_lower_median

        vals = jnp.asarray(np.ones(4, np.float32))
        mask = jnp.asarray(np.zeros(4, bool))
        assert np.isinf(float(masked_lower_median(vals, mask)))
