"""Differentiable ray-batch volume renderer.

TPU-native redesign of the reference renderer
(ref: src/utils/Renderer.py:110-327): one jit-compiled pure function
``render_rays`` that fuses near/far computation, stratified + surface-band
sampling, scene query (decoders + attentive TSDF fusion), and sigmoid-
occupancy compositing. Everything is shape-static; the reference's dynamic
point splitting / chunking disappears because XLA tiles the fused batch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from attentive_dfprior_tpu.models.decoders import df_forward
from attentive_dfprior_tpu.ops.compositing import raw2outputs
from attentive_dfprior_tpu.ops.rays import (
    get_rays_full_image,
    ray_bound_intersection,
    sample_pdf,
)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration (ref: configs/df_prior.yaml:93-98)."""

    N_samples: int = 32
    N_surface: int = 16
    N_importance: int = 0
    lindisp: bool = False
    perturb: float = 0.0
    occupancy: bool = True


def make_z_vals(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    gt_depth: jnp.ndarray,
    bound: jnp.ndarray,
    rcfg: RenderConfig,
    key: Optional[jax.Array] = None,
    no_gt_depth: bool = False,
) -> jnp.ndarray:
    """Per-ray sample depths: stratified near->far + surface band, sorted.

    Matches the reference's sampling scheme (ref: Renderer.py:140-221):
      - near = 0.01 * gt_depth
      - far  = clamp(bound-exit + 0.01, 0, max(gt_depth) * 1.2)
      - N_samples stratified in [near, far]
      - N_surface in [0.95 d, 1.05 d] for d > 0; uniform [1e-3, max depth]
        for d == 0 (so zero-depth pixels still supervise color).

    With ``no_gt_depth`` (the reference's gt_depth=None branch,
    ref: Renderer.py:149-162): near = 0.01, far = bound exit (unclamped),
    and no surface band — pure stratified sampling to the scene bound.

    Returns:
        (R, N_samples + N_surface) sorted z values
        ((R, N_samples) when no_gt_depth).
    """
    R = rays_o.shape[0]
    gt_depth = gt_depth.reshape(R)

    far_bb = ray_bound_intersection(
        jax.lax.stop_gradient(rays_o), jax.lax.stop_gradient(rays_d), bound
    ) + 0.01  # (R,)
    if no_gt_depth:
        far = far_bb[:, None]
        near = jnp.full((R, 1), 0.01, dtype=rays_o.dtype)
    else:
        max_depth = jnp.max(gt_depth)
        far = jnp.clip(far_bb, 0.0, max_depth * 1.2)[:, None]  # (R, 1)
        near = (gt_depth * 0.01)[:, None]

    t = jnp.linspace(0.0, 1.0, rcfg.N_samples, dtype=rays_o.dtype)
    if not rcfg.lindisp:
        z_vals = near * (1.0 - t) + far * t  # (R, N_samples)
    else:
        z_vals = 1.0 / (1.0 / jnp.maximum(near, 1e-6) * (1.0 - t) + 1.0 / far * t)

    if rcfg.perturb > 0.0 and key is not None:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand

    if rcfg.N_surface > 0 and not no_gt_depth:
        ts = jnp.linspace(0.0, 1.0, rcfg.N_surface, dtype=rays_o.dtype)
        d = gt_depth[:, None]
        z_surf_pos = 0.95 * d * (1.0 - ts) + 1.05 * d * ts
        z_surf_zero = 0.001 * (1.0 - ts) + max_depth * ts  # (N_surface,)
        z_surf = jnp.where(d > 0, z_surf_pos, z_surf_zero[None, :])
        z_vals = jnp.sort(jnp.concatenate([z_vals, z_surf], axis=-1), axis=-1)

    return z_vals


def render_rays(
    params: Dict[str, Any],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    gt_depth: jnp.ndarray,
    tsdf_volume: jnp.ndarray,
    tsdf_bnds: jnp.ndarray,
    bound: jnp.ndarray,
    stage: str,
    rcfg: RenderConfig,
    key: Optional[jax.Array] = None,
    fused: bool = False,
    no_gt_depth: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Render a batch of rays (ref: Renderer.py:110-255).

    Args:
        params: scene pytree ({grids..., decoders...}).
        rays_o / rays_d: (R, 3). gt_depth: (R,) sensor depth (0 = no reading).
        stage: 'low' | 'high' | 'color' (static).
        fused: use the forward-only Pallas decoder kernel (no-grad paths only).
        no_gt_depth: render without sensor depth (the reference's
            gt_depth=None branch, ref: Renderer.py:140-162) — near 0.01,
            far = bound exit, no surface band. ``gt_depth`` is ignored.

    Returns:
        depth (R,), depth_var (R,), color (R, 3), att_weight (R, S).
    """
    z_vals = make_z_vals(
        rays_o, rays_d, gt_depth, bound, rcfg, key, no_gt_depth=no_gt_depth
    )
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]  # (R,S,3)
    R, S = z_vals.shape
    flat = pts.reshape(-1, 3)

    raw, att_w = df_forward(
        params, flat, params, tsdf_volume, tsdf_bnds, bound, stage=stage,
        fused=fused,
    )

    # Out-of-bound points get occupancy 100 -> opaque wall at the bound
    # (ref: Renderer.py:49-64).
    inside = jnp.all((flat > bound[:, 0]) & (flat < bound[:, 1]), axis=-1)
    occ = jnp.where(inside, raw[:, 3], 100.0)
    raw = jnp.concatenate([raw[:, :3], occ[:, None]], axis=-1)

    raw = raw.reshape(R, S, 4)
    att_w = att_w.reshape(R, S)

    depth, depth_var, color, weights = raw2outputs(
        raw, z_vals, rays_d, occupancy=rcfg.occupancy
    )

    if rcfg.N_importance > 0:
        # Importance resampling. NOTE: the reference re-evaluates the *old*
        # points here (ref: Renderer.py:235-252 — dead code under
        # N_importance=0); we evaluate the resampled points, which is the
        # intended behavior.
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        ikey = key if key is not None else jax.random.PRNGKey(0)
        z_samples = sample_pdf(
            ikey, z_mid, weights[..., 1:-1], rcfg.N_importance, det=(rcfg.perturb == 0.0)
        )
        z_samples = jax.lax.stop_gradient(z_samples)
        z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
        pts2 = rays_o[:, None, :] + rays_d[:, None, :] * z_all[..., None]
        flat2 = pts2.reshape(-1, 3)
        raw2, att_w2 = df_forward(
            params, flat2, params, tsdf_volume, tsdf_bnds, bound, stage=stage,
            fused=fused,
        )
        inside2 = jnp.all((flat2 > bound[:, 0]) & (flat2 < bound[:, 1]), axis=-1)
        occ2 = jnp.where(inside2, raw2[:, 3], 100.0)
        raw2 = jnp.concatenate([raw2[:, :3], occ2[:, None]], axis=-1)
        S2 = S + rcfg.N_importance
        depth, depth_var, color, _ = raw2outputs(
            raw2.reshape(R, S2, 4), z_all, rays_d, occupancy=rcfg.occupancy
        )
        att_w = att_w2.reshape(R, S2)

    return depth, depth_var, color, att_w


class Renderer:
    """Convenience wrapper holding static config + jitted stage functions.

    Mirrors the reference Renderer class surface (render_batch_ray /
    render_img) for users of the framework; internally it's a thin cache of
    jit-compiled ``render_rays`` partials.
    """

    def __init__(
        self,
        rcfg: RenderConfig,
        bound: np.ndarray,
        tsdf_bnds: np.ndarray,
        cam,
        ray_batch_size: int = 10000,
        use_fused: Optional[bool] = None,
    ):
        self.rcfg = rcfg
        self.bound = jnp.asarray(bound, dtype=jnp.float32)
        self.tsdf_bnds = jnp.asarray(tsdf_bnds, dtype=jnp.float32)
        self.cam = cam
        self.ray_batch_size = ray_batch_size
        # This class only serves no-gradient paths (visualization, eval),
        # so the forward-only fused Pallas decoder kernel is safe; default
        # on when running on a TPU backend. DFPRIOR_NO_FUSED_EVAL=1 is the
        # escape hatch.
        import os

        if use_fused is None:
            use_fused = (
                jax.default_backend() == "tpu"
                and os.environ.get("DFPRIOR_NO_FUSED_EVAL") != "1"
            )
        self.use_fused = use_fused
        self._jitted = {}

    def _fn(self, stage: str, no_gt_depth: bool = False):
        k = (stage, no_gt_depth)
        if k not in self._jitted:
            self._jitted[k] = jax.jit(
                functools.partial(
                    render_rays, stage=stage, rcfg=self.rcfg,
                    fused=self.use_fused, no_gt_depth=no_gt_depth,
                )
            )
        return self._jitted[k]

    def eval_points(self, params, p, tsdf_volume, stage: str = "color"):
        """Chunked point query returning raw (N, 4) with the out-of-bound
        occ=100 wall (ref: Renderer.py:27-71)."""
        import numpy as np

        from attentive_dfprior_tpu.models.decoders import eval_points_chunk

        p = np.asarray(p, dtype=np.float32)
        bs = 2**17
        outs = []
        for i in range(0, len(p), bs):
            chunk = p[i : i + bs]
            m = len(chunk)
            if m < bs:
                chunk = np.pad(chunk, ((0, bs - m), (0, 0)))
            ret = eval_points_chunk(
                params, jnp.asarray(chunk), tsdf_volume, self.tsdf_bnds,
                self.bound, stage, fused=self.use_fused,
            )
            outs.append(np.asarray(ret[:m]))
        return np.concatenate(outs, axis=0)

    def eval_points_tsdf(self, p, tsdf_volume):
        """Trilinear TSDF values at points (ref: Renderer.py:84-107)."""
        from attentive_dfprior_tpu.models.decoders import sample_tsdf

        return np.asarray(
            sample_tsdf(tsdf_volume, jnp.asarray(p, dtype=jnp.float32), self.tsdf_bnds)
        )

    def render_batch_ray(
        self, params, rays_o, rays_d, gt_depth, tsdf_volume, stage: str
    ):
        """(ref: Renderer.py:110-255); gt_depth=None selects the
        depth-free sampling branch (ref: Renderer.py:140-162)."""
        rays_o = jnp.asarray(rays_o)
        no_gt = gt_depth is None
        gd = (
            jnp.zeros((rays_o.shape[0],), dtype=jnp.float32)
            if no_gt
            else jnp.asarray(gt_depth)
        )
        return self._fn(stage, no_gt)(
            params,
            rays_o,
            jnp.asarray(rays_d),
            gd,
            tsdf_volume,
            self.tsdf_bnds,
            self.bound,
        )

    def render_img(
        self, params, c2w, tsdf_volume, stage: str = "color", gt_depth=None
    ):
        """Render full depth/var/color images, chunked (ref: Renderer.py:258-327).

        The last chunk is padded to the static chunk size so only one
        executable is compiled.
        """
        cam = self.cam
        rays_o, rays_d = get_rays_full_image(
            cam.H, cam.W, cam.fx, cam.fy, cam.cx, cam.cy, jnp.asarray(c2w)
        )
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        n = rays_o.shape[0]
        no_gt = gt_depth is None
        if no_gt:
            gt = jnp.zeros((n,), dtype=jnp.float32)
        else:
            gt = jnp.asarray(gt_depth).reshape(-1)

        bs = self.ray_batch_size
        fn = self._fn(stage, no_gt)
        depths, uncs, colors = [], [], []
        for i in range(0, n, bs):
            sl = slice(i, min(i + bs, n))
            m = sl.stop - sl.start
            pad = bs - m
            ro = jnp.pad(rays_o[sl], ((0, pad), (0, 0)), constant_values=1.0)
            rd = jnp.pad(rays_d[sl], ((0, pad), (0, 0)), constant_values=1.0)
            gd = jnp.pad(gt[sl], (0, pad))
            d, u, c, _ = fn(
                params, ro, rd, gd, tsdf_volume, self.tsdf_bnds, self.bound
            )
            depths.append(d[:m])
            uncs.append(u[:m])
            colors.append(c[:m])
        depth = jnp.concatenate(depths).reshape(cam.H, cam.W)
        unc = jnp.concatenate(uncs).reshape(cam.H, cam.W)
        color = jnp.concatenate(colors).reshape(cam.H, cam.W, 3)
        return depth, unc, color
