"""Mapper: keyframe-window bundle adjustment of the scene representation.

TPU-native redesign of the reference Mapper (ref: src/Mapper.py:15-605):

  - The 60-iteration, 3-stage (low -> high -> color) schedule becomes three
    jit-compiled ``lax.scan`` stage loops per mapped frame — a handful of
    device dispatches instead of 60 eager iterations.
  - Pixel sampling, ray filtering, rendering, loss, backward, and the Adam
    update are fused into one compiled step; the reference's boolean ray
    filtering (ref: Mapper.py:438-449) becomes loss masking (identical sums).
  - Frustum feature selection (ref: Mapper.py:90-158, 344-361) becomes
    gradient masking: multiply grid gradients by a {0,1} frustum mask. With
    the per-frame-fresh Adam state this is exactly equivalent to optimizing
    the masked voxel subset (see ops/adam.py docstring).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from attentive_dfprior_tpu.camera import Camera
from attentive_dfprior_tpu.models.scene import SceneConfig
from attentive_dfprior_tpu.ops.adam import adam_init, adam_update
from attentive_dfprior_tpu.ops.pose import (
    pose_matrix_from_tensor,
    pose_tensor_from_matrix,
)
from attentive_dfprior_tpu.ops.rays import get_samples, ray_bound_intersection
from attentive_dfprior_tpu.render.renderer import RenderConfig, render_rays

GRID_KEYS = ("grid_low", "grid_high", "grid_color")


class StageLRs(NamedTuple):
    """Per-stage learning rates (ref: configs/df_prior.yaml:65-83)."""

    decoders: float
    mlp: float
    low: float
    high: float
    color: float


def build_lr_tree(params: Any, lrs: StageLRs, scene_cfg: SceneConfig) -> Any:
    """Per-leaf LR pytree implementing the reference's 5 optimizer groups
    (ref: src/Mapper.py:364-401). The low decoder is never optimized; high /
    color decoders follow the fix flags."""

    def lr_for(top: str):
        return {
            "grid_low": lrs.low,
            "grid_high": lrs.high,
            "grid_color": lrs.color,
            "mlp": lrs.mlp,
            "low": 0.0,
            "high": 0.0 if scene_cfg.fix_high else lrs.decoders,
            "color": 0.0 if scene_cfg.fix_color else lrs.decoders,
        }[top]

    return {
        k: jax.tree_util.tree_map(lambda _: lr_for(k), v) for k, v in params.items()
    }


def mapping_loss_fn(
    params: Any,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    gt_depth: jnp.ndarray,
    gt_color: jnp.ndarray,
    inside_mask: jnp.ndarray,
    tsdf_volume: jnp.ndarray,
    tsdf_bnds: jnp.ndarray,
    bound: jnp.ndarray,
    stage: str,
    rcfg: RenderConfig,
    w_color_loss: float,
    w_reg: jnp.ndarray,
) -> jnp.ndarray:
    """Mapping loss (ref: src/Mapper.py:451-469).

    depth L1 (masked by sensor validity AND the in-bound ray mask that the
    reference applies by filtering), optional |attention_weight - 1| warm-up
    regularizer (traced scalar flag), color L1 in the color stage.
    """
    depth, _, color, att_w = render_rays(
        params, rays_o, rays_d, gt_depth, tsdf_volume, tsdf_bnds, bound, stage, rcfg
    )
    depth_mask = (gt_depth > 0) & inside_mask
    loss = jnp.sum(jnp.abs(gt_depth - depth) * depth_mask)
    # warm-up attention regularizer (ref: Mapper.py:459-461): pushes the
    # blend toward the TSDF branch for 5 iters after the low stage on the
    # first frames.
    loss = loss + w_reg * jnp.sum(
        jnp.abs(att_w - 1.0) * inside_mask[:, None]
    )
    if stage == "color":
        loss = loss + w_color_loss * jnp.sum(
            jnp.abs(gt_color - color) * inside_mask[:, None]
        )
    return loss


@functools.partial(
    jax.jit,
    static_argnames=(
        "stage",
        "pixs_per_image",
        "cam",
        "rcfg",
        "scene_cfg_static",
        "w_color_loss",
        "use_frustum_masks",
        "ray_sharding",
        "accum",
        "ba",
    ),
    donate_argnums=(0, 1),
)
def mapping_stage(
    params: Any,
    adam_state: Any,
    frames_color: jnp.ndarray,  # (F, H, W, 3)
    frames_depth: jnp.ndarray,  # (F, H, W)
    frames_c2w: jnp.ndarray,  # (F, 4, 4)
    frustum_masks: Optional[Dict[str, jnp.ndarray]],
    tsdf_volume: jnp.ndarray,
    tsdf_bnds: jnp.ndarray,
    bound: jnp.ndarray,
    keys: jnp.ndarray,  # (n_iters, 2) PRNG keys
    w_reg_flags: jnp.ndarray,  # (n_iters,) float {0, 1}
    lrs: StageLRs,  # traced scalars
    stage: str,
    pixs_per_image: int,
    cam: Camera,
    rcfg: RenderConfig,
    scene_cfg_static: Tuple,  # (fix_high, fix_color) — hashable subset
    w_color_loss: float,
    use_frustum_masks: bool,
    ray_sharding=None,
    active: Optional[jnp.ndarray] = None,
    accum: int = 1,
    ba: bool = False,
    pose_mask: Optional[jnp.ndarray] = None,  # (F,) float {0,1}; 0 = frozen
    ba_cam_lr=0.0,
):
    """Run one optimization stage (n_iters iterations) as a scanned loop.

    With ``ba=True`` (keyframe bundle adjustment — a framework extension;
    the reference's optimize_map keeps every window pose FIXED,
    ref: src/Mapper.py:262-484, so the map bakes in tracker drift and the
    tracker then aligns to the drifted map — measured as episodic
    10-40 cm pose excursions with NOMINAL rendering loss on the synthetic
    tracking demo, ABLATE_TRACKING_r04.json): ``params`` is the combined
    tree {"scene": scene params, "pose": (F, 7) window pose tensors}; rays
    are generated from the CURRENT pose tensors inside the loss, so the
    window poses receive gradients (exactly the tracker's pose-gradient
    chain) and are optimized jointly with the scene under per-leaf-lr
    Adam. ``pose_mask`` freezes anchor frames (gauge).

    Returns (params, adam_state, per-iter losses).

    With ``ray_sharding`` (a NamedSharding over the dp mesh axis), each
    iteration's ray batch is sharded across devices; scene params stay
    replicated and XLA inserts the gradient all-reduce over ICI. This is
    the production data-parallel path (the reference is single-GPU —
    SURVEY §2.3; scale-out is this framework's north star).

    ``active`` ((n_iters,) float {0,1}, optional) gates each iteration with
    a ``lax.cond``: inactive iterations skip the whole sample/render/update
    body and pass the carry through unchanged (loss reported as 0). This
    lets the host pad scan lengths to a fixed small set so inside-iteration
    visualization does not compile a fresh executable per chunk length
    (VERDICT r2 weak #5); padding is math-identical to the unpadded scan —
    the Adam state only advances on active iterations — up to float
    reassociation inside the cond body (measured <=2e-6 abs over 5 steps,
    tests/test_vis_compile_cap.py).
    """
    fix_high, fix_color = scene_cfg_static
    scfg = SceneConfig(
        bound=np.zeros((3, 2)),  # only the fix flags matter for LR routing
        c_dim=0,
        low_grid_len=0,
        high_grid_len=0,
        color_grid_len=0,
        fix_high=fix_high,
        fix_color=fix_color,
    )
    if ba:
        lr_tree = {
            "scene": build_lr_tree(params["scene"], lrs, scfg),
            "pose": ba_cam_lr,
        }
    else:
        lr_tree = build_lr_tree(params, lrs, scfg)
    F = frames_color.shape[0]
    H, W = cam.H, cam.W

    def one_iter(carry, xs):
        if active is None:
            key, w_reg = xs
        else:
            key, w_reg, act = xs
        return _body(carry, key, w_reg) if active is None else jax.lax.cond(
            act > 0, lambda c: _body(c, key, w_reg),
            lambda c: (c, jnp.float32(0.0)), carry,
        )

    def _body(carry, key, w_reg):
        params, astate = carry
        fkeys = jax.random.split(key, F)

        if ba:
            def scaled_loss(opt):
                c2ws = jax.vmap(pose_matrix_from_tensor)(opt["pose"])  # (F,3,4)

                def sample_frame(k, color_f, depth_f, c2w_f):
                    return get_samples(
                        k, 0, H, 0, W, pixs_per_image * accum,
                        cam.fx, cam.fy, cam.cx, cam.cy, c2w_f, depth_f,
                        color_f,
                    )

                ro, rd, gd, gc = jax.vmap(sample_frame)(
                    fkeys, frames_color, frames_depth, c2ws
                )
                ro = ro.reshape(-1, 3)
                rd = rd.reshape(-1, 3)
                gd = gd.reshape(-1)
                gc = gc.reshape(-1, 3)
                if ray_sharding is not None:
                    from attentive_dfprior_tpu.parallel.sharding import (
                        constrain_rays,
                    )

                    ro, rd, gd, gc = constrain_rays(ray_sharding, ro, rd, gd, gc)
                t = ray_bound_intersection(
                    jax.lax.stop_gradient(ro), jax.lax.stop_gradient(rd), bound
                )
                inside = t >= gd
                loss = mapping_loss_fn(
                    opt["scene"], ro, rd, gd, gc, inside, tsdf_volume,
                    tsdf_bnds, bound, stage, rcfg, w_color_loss, w_reg,
                )
                return loss / accum if accum != 1 else loss

            loss, grads = jax.value_and_grad(scaled_loss)(params)
            grads["pose"] = grads["pose"] * pose_mask[:, None]
            if use_frustum_masks and frustum_masks is not None:
                for gk in GRID_KEYS:
                    grads["scene"][gk] = grads["scene"][gk] * frustum_masks[gk]
            params, astate = adam_update(params, grads, astate, lr_tree)
            return (params, astate), loss

        # ``accum`` > 1 folds k gradient-accumulation microbatches into ONE
        # k-fold-larger sampled batch: the mapping loss is a pure SUM over
        # rays, so summing k microbatch gradients and one backward over the
        # concatenated batch are the same linear algebra — but the larger
        # batch needs only ONE gradient all-reduce per Adam step, which is
        # exactly the communication amortization the comm model prescribes
        # for strong scaling (SCALING_r03; PARITY.md §Scaling). The loss is
        # scaled 1/accum so Adam's eps regime and the reported per-iter
        # loss stay at single-microbatch magnitude.
        n_draw = pixs_per_image * accum

        def sample_frame(k, color_f, depth_f, c2w_f):
            return get_samples(
                k, 0, H, 0, W, n_draw,
                cam.fx, cam.fy, cam.cx, cam.cy, c2w_f, depth_f, color_f,
            )

        ro, rd, gd, gc = jax.vmap(sample_frame)(
            fkeys, frames_color, frames_depth, frames_c2w
        )
        ro = ro.reshape(-1, 3)
        rd = rd.reshape(-1, 3)
        gd = gd.reshape(-1)
        gc = gc.reshape(-1, 3)
        if ray_sharding is not None:
            from attentive_dfprior_tpu.parallel.sharding import constrain_rays

            ro, rd, gd, gc = constrain_rays(ray_sharding, ro, rd, gd, gc)

        # in-bound ray mask (ref: Mapper.py:438-449), as loss weights
        t = ray_bound_intersection(ro, rd, bound)
        inside = t >= gd

        def scaled_loss(p):
            return mapping_loss_fn(
                p, ro, rd, gd, gc, inside, tsdf_volume, tsdf_bnds, bound,
                stage, rcfg, w_color_loss, w_reg,
            ) / accum

        loss, grads = jax.value_and_grad(scaled_loss)(params)
        if use_frustum_masks and frustum_masks is not None:
            for gk in GRID_KEYS:
                grads[gk] = grads[gk] * frustum_masks[gk]
        params, astate = adam_update(params, grads, astate, lr_tree)
        return (params, astate), loss

    xs = (keys, w_reg_flags) if active is None else (keys, w_reg_flags, active)
    (params, adam_state), losses = jax.lax.scan(
        one_iter, (params, adam_state), xs
    )
    return params, adam_state, losses


def _bilinear_sample_border0(img: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Bilinear sample ``img`` at float pixel coords (u, v), zero outside.

    Matches cv2.remap(INTER_LINEAR, BORDER_CONSTANT=0) semantics but has no
    OpenCV row-count limit (cv2.remap asserts rows < SHRT_MAX, which the
    reference works around by chunking at 3e4 — ref: src/Mapper.py:125-131;
    this pure-numpy version handles Replica-scale grids in one shot).
    """
    H, W = img.shape
    # guard against inf/NaN coords from near-zero projective depth
    u = np.nan_to_num(u, nan=-1e9, posinf=1e9, neginf=-1e9)
    v = np.nan_to_num(v, nan=-1e9, posinf=1e9, neginf=-1e9)
    u = np.clip(u, -2.0, W + 1.0)
    v = np.clip(v, -2.0, H + 1.0)
    u0 = np.floor(u).astype(np.int64)
    v0 = np.floor(v).astype(np.int64)
    du = (u - u0).astype(np.float64)
    dv = (v - v0).astype(np.float64)
    out = np.zeros(u.shape, dtype=np.float64)
    for iu, iv, w in (
        (u0, v0, (1 - du) * (1 - dv)),
        (u0 + 1, v0, du * (1 - dv)),
        (u0, v0 + 1, (1 - du) * dv),
        (u0 + 1, v0 + 1, du * dv),
    ):
        valid = (iu >= 0) & (iu < W) & (iv >= 0) & (iv < H)
        val = np.where(
            valid, img[np.clip(iv, 0, H - 1), np.clip(iu, 0, W - 1)], 0.0
        )
        out += w * val
    return out.astype(np.float32)


def get_frustum_mask(
    c2w: np.ndarray,
    grid_shape_xyz: Tuple[int, int, int],
    bound: np.ndarray,
    depth_np: np.ndarray,
    cam: Camera,
) -> np.ndarray:
    """Frustum + depth-test voxel mask for one grid (host-side).

    Semantics of the reference's get_mask_from_c2w (ref: src/Mapper.py:90-158):
    voxel centers on the bound lattice are projected into the current view;
    kept if inside the image, in front of the camera, and within
    (sampled depth + 0.5 m); voxels within 0.5 m of the camera center are
    always kept. Depth is sampled bilinearly (border 0) with zero readings
    replaced by the max depth. Unlike the reference (cv2.remap chunked at
    3e4 rows to dodge the SHRT_MAX assert), the bilinear sample is pure
    numpy and handles Replica-scale grids (>180k voxels) unchunked.

    Returns:
        (nx, ny, nz) bool mask in our natural grid layout.
    """
    nx, ny, nz = grid_shape_xyz
    X, Y, Z = np.meshgrid(
        np.linspace(bound[0][0], bound[0][1], nx),
        np.linspace(bound[1][0], bound[1][1], ny),
        np.linspace(bound[2][0], bound[2][1], nz),
        indexing="ij",
    )
    points = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)

    w2c = np.linalg.inv(c2w.astype(np.float64))
    homo = np.concatenate([points, np.ones((len(points), 1))], axis=1)
    cam_cord = (w2c @ homo.T).T[:, :3]
    cam_cord[:, 0] *= -1
    K = cam.K
    uv = (K @ cam_cord.T).T
    z = uv[:, 2:3] + 1e-5
    uv = (uv[:, :2] / z).astype(np.float32)

    depths = _bilinear_sample_border0(
        np.asarray(depth_np, dtype=np.float32), uv[:, 0], uv[:, 1]
    ).reshape(-1, 1)

    edge = 0
    mask = (
        (uv[:, 0] < cam.W - edge)
        & (uv[:, 0] > edge)
        & (uv[:, 1] < cam.H - edge)
        & (uv[:, 1] > edge)
    )
    zero = depths == 0
    if zero.any():
        depths[zero] = depths.max()
    mask = mask & (0 <= -z[:, 0]) & (-z[:, 0] <= depths[:, 0] + 0.5)

    # always keep voxels near the camera center (ref: Mapper.py:147-154)
    dist2 = np.sum((points - c2w[:3, 3]) ** 2, axis=1)
    mask = mask | (dist2 < 0.25)
    return mask.reshape(nx, ny, nz)


class Mapper:
    """Host-side mapping agent driving the jitted stage loops."""

    def __init__(
        self,
        cfg: Dict[str, Any],
        cam: Camera,
        scene_cfg: SceneConfig,
        rcfg: RenderConfig,
        tsdf_volume,
        tsdf_bnds,
        ray_sharding=None,
    ):
        m = cfg["mapping"]
        self.ray_sharding = ray_sharding
        self.cfg = cfg
        self.cam = cam
        self.scene_cfg = scene_cfg
        self.rcfg = rcfg
        self.tsdf_volume = tsdf_volume
        self.tsdf_bnds = jnp.asarray(tsdf_bnds, dtype=jnp.float32)
        self.bound = jnp.asarray(scene_cfg.bound, dtype=jnp.float32)

        self.mapping_pixels = int(m["pixels"])
        self.num_joint_iters = int(m["iters"])
        self.iters_first = int(m["iters_first"])
        self.lr_factor = float(m["lr_factor"])
        self.lr_first_factor = float(m["lr_first_factor"])
        self.low_iter_ratio = float(m["low_iter_ratio"])
        self.high_iter_ratio = float(m["high_iter_ratio"])
        self.mapping_window_size = int(m["mapping_window_size"])
        self.w_color_loss = float(m["w_color_loss"])
        self.frustum_feature_selection = bool(m["frustum_feature_selection"])
        # gradient accumulation factor (parallel.accum): k-fold larger
        # sampled batch per Adam step == k accumulated microbatches (the
        # loss is a sum over rays), amortizing the dp gradient all-reduce
        # k-fold — the comm model's strong-scaling prescription
        # (SCALING_r03: n=8 at the reference 1000-ray batch needs accum ~5
        # for >=94% efficiency)
        self.accum = int(cfg.get("parallel", {}).get("accum", 1))
        if self.accum < 1:
            raise ValueError(f"parallel.accum must be >= 1, got {self.accum}")
        # keyframe bundle adjustment (framework extension; the reference
        # never optimizes window poses). Default off = reference semantics.
        self.ba = bool(m.get("BA", False))
        if self.ba and bool(cfg.get("tracking", {}).get("gt_camera", False)):
            # BA write-backs would overwrite the GROUND-TRUTH trajectory and
            # keyframe poses with BA-perturbed ones (up to ba_max_dt /
            # ba_max_rot_deg per mapped frame), silently degrading a
            # GT-pose evaluation run — there is no drift for BA to fix.
            print(
                "[mapper] mapping.BA disabled: tracking.gt_camera is set "
                "(BA would perturb the ground-truth poses)"
            )
            self.ba = False
        self.ba_cam_lr = float(m.get("ba_cam_lr", 1e-3))
        self.keyframe_selection_method = m.get("keyframe_selection_method", "overlap")
        self.stage_lrs = {
            s: StageLRs(
                decoders=float(m["stage"][s]["decoders_lr"]),
                mlp=float(m["stage"][s]["mlp_lr"]),
                low=float(m["stage"][s]["low_lr"]),
                high=float(m["stage"][s]["high_lr"]),
                color=float(m["stage"][s]["color_lr"]),
            )
            for s in ("low", "high", "color")
        }
        self._grid_shapes: Optional[Dict[str, Tuple[int, int, int]]] = None

    # ------------------------------------------------------------------

    def _stage_schedule(
        self,
        num_joint_iters: int,
        low_iter_ratio: Optional[float] = None,
        high_iter_ratio: Optional[float] = None,
    ) -> List[Tuple[str, int, int]]:
        """[(stage, start_iter, end_iter)] matching ref: Mapper.py:390-395."""
        if low_iter_ratio is None:
            low_iter_ratio = self.low_iter_ratio
        if high_iter_ratio is None:
            high_iter_ratio = self.high_iter_ratio
        lo_end = int(num_joint_iters * low_iter_ratio)
        hi_end = int(num_joint_iters * high_iter_ratio)
        spans = []
        if lo_end >= 0:
            spans.append(("low", 0, min(lo_end, num_joint_iters - 1)))
        if hi_end > lo_end:
            spans.append(("high", lo_end + 1, min(hi_end, num_joint_iters - 1)))
        if num_joint_iters - 1 > hi_end:
            spans.append(("color", hi_end + 1, num_joint_iters - 1))
        # normalize: drop empty/overlapping spans
        out = []
        for stage, s, e in spans:
            if e >= s:
                out.append((stage, s, e))
        return out

    def optimize_map(
        self,
        params: Any,
        num_joint_iters: int,
        lr_factor: float,
        idx: int,
        frames_color: jnp.ndarray,
        frames_depth: jnp.ndarray,
        frames_c2w: np.ndarray,
        key: jax.Array,
        cur_depth_np: Optional[np.ndarray] = None,
        cur_c2w_np: Optional[np.ndarray] = None,
        color_refine: bool = False,
        visualizer=None,
        cur_color_np: Optional[np.ndarray] = None,
        ba_anchor: int = 0,
    ) -> Tuple[Any, jax.Array, Dict[str, float], Optional[np.ndarray]]:
        """One mapped frame: fresh Adam state + staged scans
        (ref: src/Mapper.py:262-484).

        Args:
            frames_color/depth/c2w: the optimization window (selected
                keyframes + current frame stacked; F frames).
            color_refine: final-frame color-only refinement
                (ref: src/Mapper.py:532-539) — color stage only, color
                decoder frozen, no frustum selection. Expressed as per-call
                overrides so the Mapper is never mutated (safe under resume
                / re-entrant run()).
            visualizer: when given and this frame passes its idx gate, the
                reference's inside-iteration panels are rendered
                (ref: src/Mapper.py:403-405): the stage scans are split at
                vis_inside_freq boundaries (Adam state carries through, so
                the optimization math is unchanged) and the panel is
                rendered from the mid-optimization params.

        Returns:
            (updated params, new PRNG key, {stage: last-iter loss},
             refined window c2w (F, 4, 4) when mapping.BA is on, else None).
        """
        F = frames_color.shape[0]
        pixs_per_image = self.mapping_pixels // F
        low_ratio = 0.0 if color_refine else None
        high_ratio = 0.0 if color_refine else None
        fix_color = True if color_refine else self.scene_cfg.fix_color
        use_frustum = self.frustum_feature_selection and not color_refine

        frustum_masks = None
        if use_frustum and cur_depth_np is not None:
            if self._grid_shapes is None:
                self._grid_shapes = {
                    k: tuple(params[k].shape[:3]) for k in GRID_KEYS
                }
            frustum_masks = {}
            for k in GRID_KEYS:
                mask = get_frustum_mask(
                    cur_c2w_np,
                    self._grid_shapes[k],
                    np.asarray(self.scene_cfg.bound),
                    cur_depth_np,
                    self.cam,
                )
                frustum_masks[k] = jnp.asarray(
                    mask[..., None], dtype=jnp.float32
                )

        vis_this_frame = (
            visualizer is not None
            and cur_depth_np is not None
            and cur_color_np is not None
            and idx % visualizer.freq == 0
        )

        ba_on = self.ba and not color_refine and F >= 3
        if ba_on:
            pose_t0 = jnp.asarray(
                np.stack(
                    [
                        pose_tensor_from_matrix(np.asarray(frames_c2w[i]))
                        for i in range(F)
                    ]
                ),
                jnp.float32,
            )
            pose_mask_np = np.ones((F,), np.float32)
            pose_mask_np[int(ba_anchor)] = 0.0  # gauge anchor
            pose_mask = jnp.asarray(pose_mask_np)
            params = {"scene": params, "pose": pose_t0}
        else:
            pose_mask = None

        adam_state = adam_init(params)
        losses: Dict[str, float] = {}
        for stage, s, e in self._stage_schedule(num_joint_iters, low_ratio, high_ratio):
            n = e - s + 1
            key, sub = jax.random.split(key)
            iter_keys = jax.random.split(sub, n)
            # warm-up w-regularizer iters (ref: Mapper.py:459-461)
            eff_low = self.low_iter_ratio if low_ratio is None else low_ratio
            lo_end = int(num_joint_iters * eff_low)
            w_flags = np.array(
                [
                    1.0 if (idx <= 1 and lo_end < (s + i) <= lo_end + 5) else 0.0
                    for i in range(n)
                ],
                dtype=np.float32,
            )
            lrs = StageLRs(*[v * lr_factor for v in self.stage_lrs[stage]])
            # chunk the scan at inside-vis boundaries (global joint_iter
            # multiples of vis_inside_freq, matching ref: Mapper.py:403-405);
            # the Adam state carries across chunks, so chunking changes only
            # where the host regains control, not the math. Every chunk is
            # PADDED to one fixed length P = min(vis_inside_freq, n) with
            # `active`-masked (lax.cond-skipped) iterations, so a vis-enabled
            # run compiles at most ONE extra mapping_stage executable per
            # stage instead of one per distinct chunk length (VERDICT r2
            # weak #5).
            if vis_this_frame:
                fin = max(1, int(visualizer.inside_freq))
                marks = [g - s for g in range(s, e + 1) if g % fin == 0]
                bounds = sorted(set([0] + [m for m in marks if m > 0] + [n]))
                pad_len = min(fin, n)
            else:
                bounds = [0, n]
                pad_len = None
            last_loss = None
            for a, b in zip(bounds[:-1], bounds[1:]):
                if vis_this_frame and (s + a) % max(1, int(visualizer.inside_freq)) == 0:
                    visualizer.vis(
                        idx, s + a, cur_depth_np, cur_color_np, cur_c2w_np,
                        params["scene"] if ba_on else params,
                        self.tsdf_volume,
                    )
                L = b - a
                if pad_len is not None:
                    pad = pad_len - L
                    sel = jnp.asarray(
                        list(range(a, b)) + [a] * pad, dtype=jnp.int32
                    )
                    chunk_keys = iter_keys[sel]
                    chunk_w = jnp.asarray(
                        np.concatenate([w_flags[a:b], np.zeros(pad, np.float32)])
                    )
                    chunk_active = jnp.asarray(
                        np.concatenate(
                            [np.ones(L, np.float32), np.zeros(pad, np.float32)]
                        )
                    )
                else:
                    chunk_keys = iter_keys[a:b]
                    chunk_w = jnp.asarray(w_flags[a:b])
                    chunk_active = None
                params, adam_state, stage_losses = mapping_stage(
                    params,
                    adam_state,
                    frames_color,
                    frames_depth,
                    jnp.asarray(frames_c2w),
                    frustum_masks,
                    self.tsdf_volume,
                    self.tsdf_bnds,
                    self.bound,
                    chunk_keys,
                    chunk_w,
                    lrs,
                    stage,
                    pixs_per_image,
                    self.cam,
                    self.rcfg,
                    (self.scene_cfg.fix_high, fix_color),
                    self.w_color_loss,
                    frustum_masks is not None,
                    self.ray_sharding,
                    chunk_active,
                    self.accum,
                    ba_on,
                    pose_mask,
                    jnp.float32(self.ba_cam_lr),
                )
                last_loss = stage_losses[L - 1]
            losses[stage] = float(last_loss)
        if ba_on:
            refined_t = params["pose"]
            params = params["scene"]
            mats34 = np.asarray(
                jax.vmap(pose_matrix_from_tensor)(refined_t)
            )  # (F, 3, 4)
            refined = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
            refined[:, :3, :] = mats34
            return params, key, losses, refined
        return params, key, losses, None
