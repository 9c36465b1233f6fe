"""SLAM system orchestrator: dataset, scene state, Tracker + Mapper loops.

Replaces the reference's two-process shared-CUDA-memory design
(ref: src/DF_Prior.py:23-311) with a host-driven loop over jit-compiled step
functions. ``sync_method='strict'`` semantics (mapping of frame i completes
before tracking of frame i+1, ref: src/Tracker.py:170-184 /
src/Mapper.py:496-509) are realized exactly by sequential alternation:

    track(i) -> [map(i) if i % every_frame == 0] -> track(i+1) -> ...

which is the serialization the reference's polling loops converge to. The
scene pytree handoff mapper->tracker is a plain argument (the reference
deep-copies shared tensors per frame, ref: src/Tracker.py:136-148).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from attentive_dfprior_tpu.camera import Camera
from attentive_dfprior_tpu.models.scene import SceneConfig, init_scene, load_bound
from attentive_dfprior_tpu.render.renderer import RenderConfig, Renderer
from attentive_dfprior_tpu.slam.keyframes import (
    KeyframeStore,
    keyframe_selection_overlap,
)
from attentive_dfprior_tpu.slam.mapper import Mapper
from attentive_dfprior_tpu.slam.tracker import Tracker
from attentive_dfprior_tpu.utils.datasets import get_dataset
from attentive_dfprior_tpu.utils.logger import Logger, load_checkpoint
from attentive_dfprior_tpu.utils.mesher import Mesher
from attentive_dfprior_tpu.utils.visualizer import Visualizer


def load_tsdf_volume(cfg: Dict[str, Any], args=None):
    """Load (or lazily build) the TSDF prior volume + bounds.

    The reference loads pre-built ``{dataset}_tsdf_volume/*.pt`` tensors
    (ref: src/DF_Prior.py:74-91). We support:
      1. ``.npz`` volumes written by our get_tsdf CLI,
      2. the reference's torch ``.pt`` layout (converted on load),
      3. on-the-fly fusion for datasets available locally (synthetic).

    Returns:
        (tsdf_volume (X, Y, Z) jnp array, tsdf_bnds (3, 2) np array)
    """
    dataset = cfg["data"]["dataset"]
    scene_id = cfg["data"]["id"]
    base = f"{dataset}_tsdf_volume"
    prefix = f"scene{scene_id}" if dataset == "scannet" else f"{scene_id}"
    npz_path = os.path.join(base, f"{prefix}_tsdf_volume.npz")
    pt_path = os.path.join(base, f"{prefix}_tsdf_volume.pt")

    cfg_voxel = float(cfg.get("tsdf", {}).get("voxel_size", 4.0 / 256))
    if os.path.exists(npz_path):
        data = np.load(npz_path)
        cached_voxel = float(data["voxel_size"]) if "voxel_size" in data else None
        # only trust the cache if it was built at the configured resolution
        # (older caches without metadata are accepted as-is)
        if cached_voxel is None or abs(cached_voxel - cfg_voxel) < 1e-9:
            print(f"TSDF prior: loaded cache {npz_path} (shape {data['tsdf'].shape})")
            return jnp.asarray(data["tsdf"]), np.asarray(data["bounds"])
        print(
            f"TSDF cache {npz_path} voxel_size {cached_voxel} != configured "
            f"{cfg_voxel}; rebuilding on the fly"
        )
    if os.path.exists(pt_path):
        import torch

        vol = torch.load(pt_path, map_location="cpu")
        # reference layout [1, 1, Z, Y, X] (ref: get_tsdf.py:95-97) -> (X, Y, Z)
        vol = vol[0, 0].permute(2, 1, 0).contiguous().numpy()
        bnds = torch.load(
            os.path.join(base, f"{prefix}_bounds.pt"), map_location="cpu"
        )
        return jnp.asarray(vol), np.asarray(bnds)

    # lazily fuse (synthetic or any locally-readable dataset)
    from attentive_dfprior_tpu.tsdf.builder import build_tsdf_volume

    space = int(cfg.get("tsdf", {}).get("space", 10))
    print(f"TSDF prior: fusing on the fly (voxel {cfg_voxel}, every {space} frames)")
    tsdf, bounds, _ = build_tsdf_volume(cfg, args, space=space, voxel_size=cfg_voxel)
    return tsdf, bounds


class SLAMSystem:
    """Top-level system (ref DF_Prior class, src/DF_Prior.py:23-311)."""

    def __init__(self, cfg: Dict[str, Any], args=None, output: Optional[str] = None):
        self.cfg = cfg
        self.verbose = bool(cfg.get("verbose", False))
        self.output = output or (getattr(args, "output", None) or cfg["data"]["output"])
        os.makedirs(self.output, exist_ok=True)
        os.makedirs(f"{self.output}/mesh", exist_ok=True)

        self.cam = Camera.from_config(cfg)
        self.scale = cfg.get("scale", 1)

        # --- data + prior ---
        self.dataset = get_dataset(cfg, args, self.scale)
        self.n_img = len(self.dataset)
        self.tsdf_volume, tsdf_bnds = load_tsdf_volume(cfg, args)
        self.tsdf_bnds = np.asarray(tsdf_bnds, dtype=np.float32)

        # --- scene state ---
        pretrained = cfg.get("pretrained_decoders", {}).get("low_high")
        # the reference ships a torch blob (pretrained/low_high.pt); our
        # pretrain tool writes an .npz — fall back to the sibling .npz when
        # the configured .pt is absent
        if pretrained and not os.path.exists(str(pretrained)):
            alt = str(pretrained).rsplit(".", 1)[0] + ".npz"
            if os.path.exists(alt):
                pretrained = alt
        pretrained_exists = bool(pretrained) and os.path.exists(str(pretrained))
        self.scene_cfg = SceneConfig.from_config(cfg, pretrained_loaded=pretrained_exists)
        seed = int(cfg.get("seed", 0))
        self.key = jax.random.PRNGKey(seed)
        self.key, init_key = jax.random.split(self.key)
        self.params = init_scene(
            init_key, self.scene_cfg, pretrained if pretrained_exists else None
        )

        self.rcfg = RenderConfig(
            N_samples=int(cfg["rendering"]["N_samples"]),
            N_surface=int(cfg["rendering"]["N_surface"]),
            N_importance=int(cfg["rendering"]["N_importance"]),
            lindisp=bool(cfg["rendering"]["lindisp"]),
            perturb=float(cfg["rendering"]["perturb"]),
            occupancy=bool(cfg.get("occupancy", True)),
        )

        # --- multi-chip data parallelism (this framework's scale axis;
        # the reference is single-GPU, SURVEY §2.3) ---
        from attentive_dfprior_tpu.parallel.sharding import (
            mesh_from_config,
            ray_sharding,
            replicate,
        )

        self.mesh = mesh_from_config(cfg)
        self.ray_sharding = ray_sharding(self.mesh)
        if self.mesh is not None:
            # scene params + prior volume replicated across the mesh; ray
            # batches get sharded inside the jitted steps (constrain_rays)
            self.params = replicate(self.mesh, self.params)
            self.tsdf_volume = replicate(self.mesh, self.tsdf_volume)
            print(
                f"parallel: ray-axis DP over {len(self.mesh.devices.flat)} "
                f"devices ({self.mesh.devices.flat[0].platform})"
            )

        # --- agents + side outputs ---
        self.renderer = Renderer(
            self.rcfg, self.scene_cfg.bound, self.tsdf_bnds, self.cam
        )
        self.mapper = Mapper(
            cfg, self.cam, self.scene_cfg, self.rcfg, self.tsdf_volume,
            self.tsdf_bnds, ray_sharding=self.ray_sharding,
        )
        self.tracker = Tracker(
            cfg, self.cam, self.rcfg, self.scene_cfg.bound, self.tsdf_volume,
            self.tsdf_bnds, ray_sharding=self.ray_sharding,
        )
        self.mesher = Mesher(cfg, self.cam, self.scene_cfg.bound, self.tsdf_bnds)
        self.logger = Logger(os.path.join(self.output, "ckpts"), self.verbose)
        self.visualizer = Visualizer(
            freq=int(cfg["mapping"]["vis_freq"]),
            inside_freq=int(cfg["mapping"]["vis_inside_freq"]),
            vis_dir=os.path.join(self.output, "mapping_vis"),
            renderer=self.renderer,
            verbose=self.verbose,
        )
        self.tracking_visualizer = Visualizer(
            freq=int(cfg["tracking"]["vis_freq"]),
            inside_freq=int(cfg["tracking"]["vis_inside_freq"]),
            vis_dir=os.path.join(self.output, "tracking_vis"),
            renderer=self.renderer,
            verbose=self.verbose,
        )
        self.save_selected_keyframes_info = bool(
            cfg["mapping"].get("save_selected_keyframes_info", False)
        )
        self.selected_keyframes: Dict[int, list] = {}

        m = cfg["mapping"]
        self.every_frame = int(m["every_frame"])
        self.keyframe_every = int(m["keyframe_every"])
        self.mesh_freq = int(m["mesh_freq"])
        self.ckpt_freq = int(m["ckpt_freq"])
        self.color_refine = bool(m.get("color_refine", True))
        self.no_mesh_on_first_frame = bool(m.get("no_mesh_on_first_frame", True))
        self.no_log_on_first_frame = bool(m.get("no_log_on_first_frame", True))
        self.eval_rec = bool(cfg["meshing"].get("eval_rec", False))

        cap = int(m.get("keyframe_capacity", max(8, self.n_img // self.keyframe_every + 4)))
        self.keyframes = KeyframeStore(cap, self.cam.H, self.cam.W)

        self.estimate_c2w_list = np.zeros((self.n_img, 4, 4), dtype=np.float32)
        self.gt_c2w_list = np.zeros((self.n_img, 4, 4), dtype=np.float32)
        self._np_rng = np.random.default_rng(seed)
        self._mapped_first = False
        self.timings: Dict[str, float] = {"track": 0.0, "map": 0.0}
        from attentive_dfprior_tpu.utils.profiling import PhaseTimer

        self.profiler = PhaseTimer()
        # structured per-frame metrics stream (the reference only has
        # colorama prints — SURVEY §5)
        self._metrics_path = os.path.join(self.output, "metrics.jsonl")

    def _log_metrics(self, record: Dict[str, Any]) -> None:
        import json

        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    # ------------------------------------------------------------------

    def resume(self, ckpt_path: str) -> int:
        """Restore a checkpoint; returns the next frame index to process.

        (The reference has no resume path — SURVEY §5.)
        """
        self.params, meta = load_checkpoint(ckpt_path, self.params)
        idx = meta["idx"]
        self.estimate_c2w_list[: len(meta["estimate_c2w_list"])] = meta[
            "estimate_c2w_list"
        ]
        self.gt_c2w_list[: len(meta["gt_c2w_list"])] = meta["gt_c2w_list"]
        kf_gt = meta.get("keyframe_gt_c2w")
        for slot, kf_idx in enumerate(meta["keyframe_idx_list"]):
            _, color, depth, _ = self.dataset[int(kf_idx)]
            self.keyframes.add(
                int(kf_idx),
                color,
                depth,
                meta["keyframe_est_c2w"][slot],
                kf_gt[slot] if kf_gt is not None else self.gt_c2w_list[int(kf_idx)],
            )
        self.selected_keyframes = meta.get("selected_keyframes", {})
        self._mapped_first = True
        return idx + 1

    # ------------------------------------------------------------------

    def _select_window(self, cur_color, cur_depth, cur_c2w, window_size=None):
        """Build the optimization window: overlap-selected keyframes + the
        most recent keyframe + current frame (ref: src/Mapper.py:288-304)."""
        if window_size is None:
            window_size = self.mapper.mapping_window_size
        K = len(self.keyframes)
        sel: list = []
        if K > 0:
            if self.mapper.keyframe_selection_method == "overlap" and K > 1:
                sel = keyframe_selection_overlap(
                    self._np_rng,
                    cur_depth,
                    cur_c2w.astype(np.float64),
                    self.keyframes.poses_np()[: K - 1],
                    window_size - 2,
                    self.cam.H,
                    self.cam.W,
                    self.cam.fx,
                    self.cam.fy,
                    self.cam.cx,
                    self.cam.cy,
                )
            elif self.mapper.keyframe_selection_method == "global" and K > 1:
                num = window_size - 2
                perm = self._np_rng.permutation(K - 1)
                sel = [int(i) for i in perm[:num]]
            sel = sel + [K - 1]

        slots = np.asarray(sel, dtype=np.int32)
        if len(slots) > 0:
            f_color = jnp.concatenate(
                [jnp.take(self.keyframes.color, slots, axis=0),
                 jnp.asarray(cur_color)[None]], axis=0)
            f_depth = jnp.concatenate(
                [jnp.take(self.keyframes.depth, slots, axis=0),
                 jnp.asarray(cur_depth)[None]], axis=0)
            f_c2w = np.concatenate(
                [self.keyframes.est_c2w[slots], cur_c2w[None]], axis=0)
        else:
            f_color = jnp.asarray(cur_color)[None]
            f_depth = jnp.asarray(cur_depth)[None]
            f_c2w = cur_c2w[None]
        return f_color, f_depth, f_c2w

    def _map_frame(self, idx, color, depth, c2w, gt_c2w, first: bool):
        t0 = time.time()
        color_refine = (
            not first and idx == self.n_img - 1 and self.color_refine
        )
        window_size = None
        if first:
            num_iters = self.mapper.iters_first
            lr_factor = self.mapper.lr_first_factor
            outer = 1
        elif color_refine:
            # final color refinement (ref: src/Mapper.py:532-539) — all
            # overrides are per-call; the Mapper object is never mutated
            # (safe under resume / re-entrant run())
            outer = 5
            num_iters = self.mapper.num_joint_iters
            lr_factor = self.mapper.lr_factor
            window_size = self.mapper.mapping_window_size * 2
        else:
            num_iters = self.mapper.num_joint_iters
            lr_factor = self.mapper.lr_factor
            outer = 1

        for _ in range(outer):
            f_color, f_depth, f_c2w = self._select_window(
                color, depth, c2w, window_size=window_size
            )
            if self.save_selected_keyframes_info:
                # (ref: src/Mapper.py:306-319)
                self.selected_keyframes[idx] = [
                    {"est_c2w": f_c2w[i]} for i in range(len(f_c2w))
                ]
            self.params, self.key, losses = self.mapper.optimize_map(
                self.params,
                num_iters,
                lr_factor,
                idx,
                f_color,
                f_depth,
                f_c2w,
                self.key,
                cur_depth_np=np.asarray(depth),
                cur_c2w_np=c2w,
                color_refine=color_refine,
            )
        self.timings["map"] += time.time() - t0

        # keyframe bookkeeping (ref: src/Mapper.py:560-565)
        if (
            idx % self.keyframe_every == 0 or idx == self.n_img - 2
        ) and idx not in self.keyframes.frame_idx:
            self.keyframes.add(idx, color, depth, c2w, gt_c2w)
        self._mapped_first = True
        if self.verbose:
            print(f"Mapping frame {idx}  losses={losses}")
        self._log_metrics(
            {"event": "map", "idx": int(idx), "losses": losses,
             "first": bool(first), "n_keyframes": len(self.keyframes)}
        )
        if not (idx == 0 and self.cfg["mapping"].get("no_vis_on_first_frame", True)):
            self.visualizer.vis(
                idx, 0, depth, color, c2w, self.params, self.tsdf_volume
            )

    def _kf_depths_np(self):
        K = len(self.keyframes)
        return np.asarray(self.keyframes.depth[:K])

    # ------------------------------------------------------------------

    def run(self, start_idx: int = 0, end_idx: Optional[int] = None):
        """Main SLAM loop.

        sync_method (ref: src/Mapper.py:496-509, src/Tracker.py:170-184):
          - 'strict': mapping of frame i completes before tracking i+1 —
            exactly the reference's serialized schedule.
          - 'loose' / 'free': mapping of frame i is deferred by
            every_frame//2 tracked frames, so the tracker works on a map
            that is boundedly stale — the observable effect of the
            reference's relaxed polling (on one chip, execution is still
            sequential; the staleness pattern is what these modes change).
        """
        n = self.n_img if end_idx is None else min(end_idx, self.n_img)
        # generalization of the reference's hardcoded scene0050 early stop at
        # frame 4640 (ref: src/Mapper.py:576,590,604)
        stop_at = self.cfg["mapping"].get("stop_at_frame")
        if stop_at is not None:
            n = min(n, int(stop_at) + 1)
        sync = self.cfg.get("sync_method", "strict")
        lag = 0 if sync == "strict" else self.every_frame // 2
        pending: list = []  # deferred mapping jobs: (idx, color, depth, gt)

        def flush_pending(upto_idx: int):
            while pending and pending[0][0] + lag <= upto_idx:
                midx, mcolor, mdepth, mgt = pending.pop(0)
                self._map_frame(
                    midx, mcolor, mdepth,
                    self.estimate_c2w_list[midx], mgt, first=False,
                )

        for idx in range(start_idx, n):
            frame_idx, color, depth, gt_c2w = self.dataset[idx]
            self.gt_c2w_list[idx] = gt_c2w

            if idx == 0:
                self.estimate_c2w_list[0] = gt_c2w
                self._map_frame(0, color, depth, gt_c2w, gt_c2w, first=True)
            else:
                flush_pending(idx - 1)
                t0 = time.time()
                c2w, self.key, loss = self.tracker.track(
                    self.params, idx, color, depth, gt_c2w,
                    self.estimate_c2w_list, self.key,
                )
                self.timings["track"] += time.time() - t0
                self.estimate_c2w_list[idx] = c2w
                if self.verbose:
                    print(f"Tracking frame {idx}  loss={loss:.3f}")
                self._log_metrics(
                    {"event": "track", "idx": int(idx), "loss": float(loss)}
                )
                self.tracking_visualizer.vis(
                    idx, 0, depth, color, c2w, self.params, self.tsdf_volume
                )

                if not np.isfinite(gt_c2w).all():
                    continue  # skip mapping on invalid GT (ref: Mapper.py:521-524)

                if idx % self.every_frame == 0 or idx == n - 1:
                    if lag == 0 or idx == n - 1:
                        flush_pending(n)
                        self._map_frame(
                            idx, color, depth,
                            self.estimate_c2w_list[idx], gt_c2w, first=False,
                        )
                    else:
                        pending.append((idx, color, depth, gt_c2w))

            # side outputs (ref: src/Mapper.py:574-602)
            last = idx == n - 1
            if (
                (idx % self.ckpt_freq == 0 and not (idx == 0 and self.no_log_on_first_frame))
                or last
            ):
                self.logger.log(
                    idx,
                    self.params,
                    self.estimate_c2w_list,
                    self.gt_c2w_list,
                    self.keyframes.frame_idx,
                    self.keyframes.poses_np(),
                    keyframe_gt_c2w=self.keyframes.gt_c2w[: len(self.keyframes)],
                    selected_keyframes=(
                        self.selected_keyframes
                        if self.save_selected_keyframes_info
                        else None
                    ),
                )
            if (
                idx % self.mesh_freq == 0
                and not (idx == 0 and self.no_mesh_on_first_frame)
                and len(self.keyframes) > 0
            ):
                self.mesher.get_mesh(
                    f"{self.output}/mesh/{idx:05d}_mesh.ply",
                    self.params,
                    self.tsdf_volume,
                    self._kf_depths_np(),
                    self.keyframes.poses_np(),
                    self.estimate_c2w_list,
                    idx,
                )
            if last and len(self.keyframes) > 0:
                self.mesher.get_mesh(
                    f"{self.output}/mesh/final_mesh.ply",
                    self.params,
                    self.tsdf_volume,
                    self._kf_depths_np(),
                    self.keyframes.poses_np(),
                    self.estimate_c2w_list,
                    idx,
                )
                if self.eval_rec:
                    self.mesher.get_mesh(
                        f"{self.output}/mesh/final_mesh_eval_rec.ply",
                        self.params,
                        self.tsdf_volume,
                        self._kf_depths_np(),
                        self.keyframes.poses_np(),
                        self.estimate_c2w_list,
                        idx,
                        get_mask_use_all_frames=True,
                    )
        return self.estimate_c2w_list
