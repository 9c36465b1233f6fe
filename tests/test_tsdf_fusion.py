"""TSDF fusion tests: golden comparison vs a small numpy reference
implementing the reference kernel's update rule (ref: src/fusion.py:69-144),
plus geometric sanity on a synthetic frame."""

import numpy as np
import jax.numpy as jnp

from attentive_dfprior_tpu.tsdf.fusion import TSDFVolume, integrate_frame


def numpy_reference_integrate(tsdf, weight, depth_im, K, w2c, origin, vsize, trunc, obs_w=1.0):
    """Straightforward per-voxel numpy port of the update rule."""
    X, Y, Z = tsdf.shape
    H, W = depth_im.shape
    out_t = tsdf.copy()
    out_w = weight.copy()
    for i in range(X):
        for j in range(Y):
            for k in range(Z):
                p = origin + np.array([i, j, k]) * vsize
                c = w2c[:3, :3] @ p + w2c[:3, 3]
                if c[2] <= 0:
                    continue
                u = int(round(K[0, 0] * c[0] / c[2] + K[0, 2]))
                v = int(round(K[1, 1] * c[1] / c[2] + K[1, 2]))
                if not (0 <= u < W and 0 <= v < H):
                    continue
                d = depth_im[v, u]
                if d == 0:
                    continue
                diff = d - c[2]
                if diff < -trunc:
                    continue
                dist = min(1.0, diff / trunc)
                w_old = out_w[i, j, k]
                w_new = w_old + obs_w
                out_t[i, j, k] = (out_t[i, j, k] * w_old + obs_w * dist) / w_new
                out_w[i, j, k] = w_new
    return out_t, out_w


def test_integrate_matches_numpy_reference():
    rng = np.random.default_rng(0)
    X, Y, Z = 6, 5, 7
    H, W = 12, 16
    vsize = 0.1
    trunc = 5 * vsize
    origin = np.array([-0.3, -0.25, 0.2], np.float32)
    K = np.array([[20.0, 0, 8.0], [0, 20.0, 6.0], [0, 0, 1]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    depth = rng.uniform(0.3, 1.2, (H, W)).astype(np.float32)
    depth[0, :] = 0  # invalid row

    tsdf0 = -np.ones((X, Y, Z), np.float32)
    w0 = np.zeros((X, Y, Z), np.float32)
    ref_t, ref_w = numpy_reference_integrate(
        tsdf0, w0, depth, K, w2c, origin, vsize, trunc
    )

    color0 = jnp.zeros((X, Y, Z, 3))
    out_t, out_w, _ = integrate_frame(
        jnp.asarray(tsdf0),
        jnp.asarray(w0),
        color0,
        jnp.asarray(depth),
        jnp.zeros((H, W, 3)),
        jnp.asarray(K),
        jnp.asarray(w2c),
        jnp.asarray(origin),
        vsize,
        trunc,
    )
    np.testing.assert_allclose(np.asarray(out_t), ref_t, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_w), ref_w, rtol=1e-5, atol=1e-5)


def test_fused_plane_zero_crossing():
    """Fusing a flat-depth frame must put the TSDF zero crossing at the
    observed plane depth."""
    vol = TSDFVolume(np.array([[-1, 1], [-1, 1], [0, 2.2]]), voxel_size=0.05)
    H, W = 64, 64
    K = np.array([[60.0, 0, 31.5], [0, 60.0, 31.5], [0, 0, 1]])
    depth = np.full((H, W), 1.5, np.float32)
    # camera at origin looking +z (OpenCV), plane at z=1.5
    pose = np.eye(4)
    for _ in range(3):
        vol.integrate(np.zeros((H, W, 3), np.float32), depth, K, pose)
    tsdf, _, bnds = vol.get_volume()
    # central column along z
    X, Y, Z = tsdf.shape
    col = tsdf[X // 2, Y // 2, :]
    zs = bnds[2, 0] + np.arange(Z) * vol.voxel_size
    observed = (col > -1) | (np.arange(Z) < Z)
    # in front of the plane: positive; behind (within trunc): negative
    front = (zs > 0.5) & (zs < 1.4)
    behind = (zs > 1.6) & (zs < 1.7)
    assert (col[front] > 0).all(), col[front]
    assert (col[behind] < 0).all(), col[behind]
    # the positive->negative crossing (surface) within two voxels of z=1.5
    # (the first unobserved->positive flip near the camera is not a surface)
    # note: the voxel exactly at the plane gets tsdf == 0.0, so the left
    # side of the crossing is >= 0
    desc = np.where((col[:-1] >= 0) & (col[1:] < 0))[0]
    assert len(desc) > 0
    z_cross = zs[desc[0]]
    assert abs(z_cross - 1.5) < 2 * vol.voxel_size


def test_color_running_average():
    vol = TSDFVolume(np.array([[-0.5, 0.5], [-0.5, 0.5], [0.5, 1.5]]), voxel_size=0.1)
    H, W = 32, 32
    K = np.array([[30.0, 0, 15.5], [0, 30.0, 15.5], [0, 0, 1]])
    depth = np.full((H, W), 1.0, np.float32)
    c1 = np.full((H, W, 3), 100.0, np.float32)
    c2 = np.full((H, W, 3), 200.0, np.float32)
    vol.integrate(c1, depth, K, np.eye(4))
    vol.integrate(c2, depth, K, np.eye(4))
    _, color, _ = vol.get_volume()
    observed = color[color.sum(-1) > 0]
    assert len(observed) > 0
    np.testing.assert_allclose(observed, 150.0, atol=1.0)


class TestLegacyObservedMask:
    """Regression: an observed voxel whose running average sits exactly at
    -1.0 must not be classified as unobserved (and then filled to +1) when
    it adjoins the interior surface band (VERDICT r03 weak #3)."""

    def test_clamped_voxel_next_to_surface_band_is_observed(self):
        from attentive_dfprior_tpu.tsdf.fusion import legacy_observed_mask

        tsdf = np.full((6, 6, 6), -1.0, dtype=np.float32)
        # an observed column: free space +1 -> surface band -> interior -0.6
        tsdf[2, 2, 4] = 1.0
        tsdf[2, 2, 3] = 0.2
        tsdf[2, 2, 2] = -0.6
        # voxel (2,2,1): genuinely observed, clamped running average == -1.0
        # (indistinguishable from init by value alone); adjoins the band
        obs = legacy_observed_mask(tsdf)
        assert obs[2, 2, 4] and obs[2, 2, 3] and obs[2, 2, 2]
        assert obs[2, 2, 1], "clamped -1.0 voxel next to surface band lost"
        # one dilation step only: deeper interior is the untouched init
        assert not obs[2, 2, 0]
        # but a far-away isolated -1.0 region (disconnected from any observed
        # negative voxel) stays unobserved = untouched init
        assert not obs[5, 5, 5]

    def test_all_minus_one_volume_stays_unobserved(self):
        from attentive_dfprior_tpu.tsdf.fusion import legacy_observed_mask

        tsdf = np.full((4, 4, 4), -1.0, dtype=np.float32)
        assert not legacy_observed_mask(tsdf).any()

    def test_positive_only_neighbors_do_not_absorb(self):
        from attentive_dfprior_tpu.tsdf.fusion import legacy_observed_mask

        # free space next to an untouched region: must NOT claim the region
        tsdf = np.full((4, 4, 4), -1.0, dtype=np.float32)
        tsdf[0, :, :] = 1.0
        obs = legacy_observed_mask(tsdf)
        assert obs[0].all() and not obs[1:].any()
