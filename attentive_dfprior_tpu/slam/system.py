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
        (tsdf_volume (X, Y, Z) jnp array — reference-faithful (-1 where
         unobserved), tsdf_bnds (3, 2) np array, observed (X, Y, Z) bool
         mask or None when unknown)
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
            tsdf = np.asarray(data["tsdf"])
            if "observed" in data:
                observed = np.asarray(data["observed"])
            else:
                # legacy cache without the weight mask: resolve the
                # -1.0-is-ambiguous case by surface-band adjacency
                from attentive_dfprior_tpu.tsdf.fusion import legacy_observed_mask

                observed = legacy_observed_mask(tsdf)
            return jnp.asarray(tsdf), np.asarray(data["bounds"]), observed
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
        # the reference saves no weights; -1.0 is ambiguous (untouched init
        # OR clamped observed average) -- resolve by surface-band adjacency
        from attentive_dfprior_tpu.tsdf.fusion import legacy_observed_mask

        return jnp.asarray(vol), np.asarray(bnds), legacy_observed_mask(vol)

    # lazily fuse (synthetic or any locally-readable dataset)
    from attentive_dfprior_tpu.tsdf.builder import build_tsdf_volume

    space = int(cfg.get("tsdf", {}).get("space", 10))
    print(f"TSDF prior: fusing on the fly (voxel {cfg_voxel}, every {space} frames)")
    tsdf, bounds, vol = build_tsdf_volume(cfg, args, space=space, voxel_size=cfg_voxel)
    return tsdf, bounds, vol.observed_mask()


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
        self.tsdf_volume, tsdf_bnds, tsdf_observed = load_tsdf_volume(cfg, args)
        self.tsdf_bnds = np.asarray(tsdf_bnds, dtype=np.float32)
        # Two prior volumes (see tsdf/fusion.py:fill_unobserved_volume):
        # training/tracking use the reference-faithful volume; meshing
        # queries one with never-observed voxels filled so the attentive
        # blend cannot manufacture phantom surfaces at coverage boundaries.
        from attentive_dfprior_tpu.tsdf.fusion import fill_unobserved_volume

        # fallback matches the shipped default config (configs/df_prior.yaml):
        # 'free' measured better than 'nearest' (2.2 vs 4.1 cm mesh accuracy)
        fill_mode = str(cfg.get("tsdf", {}).get("fill_unobserved", "free"))
        if tsdf_observed is not None and fill_mode != "reference":
            self.tsdf_volume_mesh = jnp.asarray(
                fill_unobserved_volume(
                    np.asarray(self.tsdf_volume), tsdf_observed, fill_mode
                )
            )
        else:
            self.tsdf_volume_mesh = self.tsdf_volume
        # TRACKING always renders against the reference-faithful volume: the
        # in-band transition at observation boundaries acts as a fence that
        # measurably stabilizes pose optimization (synthetic probe:
        # perturbed-pose recovery 0.8-1.3 cm vs 3.6 cm on filled volumes).
        self.tsdf_volume_track = self.tsdf_volume
        # optional fill for the MAPPING volume (default: reference-faithful)
        train_fill = str(
            cfg.get("tsdf", {}).get("fill_unobserved_train", "reference")
        )
        if tsdf_observed is not None and train_fill != "reference":
            self.tsdf_volume = jnp.asarray(
                fill_unobserved_volume(
                    np.asarray(self.tsdf_volume), tsdf_observed, train_fill
                )
            )

        # Production layout: all prior volumes become wide Z-row matrices
        # (ops/grid_sample.TSDFRows) — 6.6x faster trilinear sampling on TPU
        # than the (X,Y,Z) layout (scripts/bench_tsdf_gather.py). Distinct
        # volumes convert once; aliases stay shared.
        from attentive_dfprior_tpu.ops.grid_sample import tsdf_to_rows

        _rows_cache: Dict[int, Any] = {}

        def _to_rows(vol):
            k = id(vol)
            if k not in _rows_cache:
                _rows_cache[k] = tsdf_to_rows(vol)
            return _rows_cache[k]

        self.tsdf_volume_mesh = _to_rows(self.tsdf_volume_mesh)
        self.tsdf_volume_track = _to_rows(self.tsdf_volume_track)
        self.tsdf_volume = _to_rows(self.tsdf_volume)

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
            split_meshes_from_config,
        )

        split = split_meshes_from_config(cfg)
        if split is not None:
            # device-split agents: mapper on devices[:k], tracker on the
            # next m — async (loose/free) overlap becomes real device
            # concurrency instead of host-thread interleaving on one mesh
            # (ASYNC_r04 measured loose ~= strict with a shared mesh)
            if cfg.get("sync_method", "strict") == "strict":
                raise ValueError(
                    "parallel.split requires sync_method 'loose' or 'free': "
                    "strict mode serializes the agents, so split devices "
                    "would only idle (and side outputs would mix meshes)"
                )
            self.mesh, self.track_mesh = split
            self.ray_sharding = ray_sharding(self.mesh)
            self.track_sharding = ray_sharding(self.track_mesh)
            self.params = replicate(self.mesh, self.params)
            self.tsdf_volume = replicate(self.mesh, self.tsdf_volume)
            # meshing consumes the PUBLISHED (track-mesh) snapshots in
            # async mode, so its volume lives with the tracker
            self.tsdf_volume_mesh = replicate(
                self.track_mesh, self.tsdf_volume_mesh
            )
            self.tsdf_volume_track = replicate(
                self.track_mesh, self.tsdf_volume_track
            )
            print(
                f"parallel: split agents — map DP over "
                f"{len(self.mesh.devices.flat)} devices, track DP over "
                f"{len(self.track_mesh.devices.flat)} devices "
                f"({self.mesh.devices.flat[0].platform})"
            )
        else:
            self.mesh = mesh_from_config(cfg)
            self.track_mesh = self.mesh
            self.ray_sharding = ray_sharding(self.mesh)
            self.track_sharding = self.ray_sharding
            if self.mesh is not None:
                # scene params + prior volume replicated across the mesh; ray
                # batches get sharded inside the jitted steps (constrain_rays)
                self.params = replicate(self.mesh, self.params)
                self.tsdf_volume = replicate(self.mesh, self.tsdf_volume)
                self.tsdf_volume_mesh = replicate(self.mesh, self.tsdf_volume_mesh)
                self.tsdf_volume_track = replicate(self.mesh, self.tsdf_volume_track)
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
            cfg, self.cam, self.rcfg, self.scene_cfg.bound,
            self.tsdf_volume_track, self.tsdf_bnds,
            ray_sharding=self.track_sharding,
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

        # loop closure (framework extension, default off; slam/loop_closure.py)
        from attentive_dfprior_tpu.slam.loop_closure import LoopCloser

        lc_cfg = dict(cfg)
        if bool(cfg["tracking"].get("gt_camera", False)) and (
            (cfg.get("loop_closure") or {}).get("enable")
            or (cfg.get("loop_closure") or {}).get("final_refine")
        ):
            # re-localizing ground-truth poses can only perturb them
            print(
                "[system] loop_closure disabled: tracking.gt_camera is set"
            )
            lc_cfg = {**cfg, "loop_closure": {}}
        self.loop_closer = LoopCloser(
            lc_cfg, self.tracker, self.keyframes, self.cam, self.rcfg,
            self.scene_cfg.bound, self.tsdf_volume_track, self.tsdf_bnds,
            log_fn=self._log_metrics,
        )

        self.estimate_c2w_list = np.zeros((self.n_img, 4, 4), dtype=np.float32)
        self.gt_c2w_list = np.zeros((self.n_img, 4, 4), dtype=np.float32)
        self._np_rng = np.random.default_rng(seed)
        self._mapped_first = False
        # async (loose/free) runs split self.key into independent per-thread
        # streams so the mapper worker and the main tracker thread never
        # read-modify-write the same key concurrently (lost updates would
        # make async runs non-reproducible beyond scheduling order)
        self._map_key: Optional[jax.Array] = None
        self._track_key: Optional[jax.Array] = None
        import threading

        # guards keyframe-store mutation vs side-output reads when the
        # mapper runs in a worker thread (sync_method loose/free)
        self._kf_lock = threading.Lock()
        self.timings: Dict[str, float] = {"track": 0.0, "map": 0.0}
        from attentive_dfprior_tpu.utils.profiling import PhaseTimer

        self.profiler = PhaseTimer()
        # structured per-frame metrics stream (the reference only has
        # colorama prints — SURVEY §5)
        self._metrics_path = os.path.join(self.output, "metrics.jsonl")

    def _log_metrics(self, record: Dict[str, Any]) -> None:
        import json

        # wall-clock stamp on every event so cycle/publish timing is
        # recoverable offline (scripts/bench_async.py)
        record.setdefault("t", round(time.time(), 4))
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
        return f_color, f_depth, f_c2w, slots

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
            f_color, f_depth, f_c2w, slots = self._select_window(
                color, depth, c2w, window_size=window_size
            )
            if self.save_selected_keyframes_info:
                # (ref: src/Mapper.py:306-319); lock: the logger serializes
                # this dict from the main thread in async modes
                with self._kf_lock:
                    self.selected_keyframes[idx] = [
                        {"est_c2w": f_c2w[i]} for i in range(len(f_c2w))
                    ]
            no_vis = color_refine or (
                idx == 0 and self.cfg["mapping"].get("no_vis_on_first_frame", True)
            )
            key_in = self._map_key if self._map_key is not None else self.key
            # BA gauge anchor: the window keyframe with the SMALLEST dataset
            # frame index (the best-established pose); never the current frame
            if len(slots) > 0:
                kf_ids = [self.keyframes.frame_idx[int(sl)] for sl in slots]
                ba_anchor = int(np.argmin(kf_ids))
            else:
                ba_anchor = 0
            self.params, key_out, losses, refined_c2w = self.mapper.optimize_map(
                self.params,
                num_iters,
                lr_factor,
                idx,
                f_color,
                f_depth,
                f_c2w,
                key_in,
                cur_depth_np=np.asarray(depth),
                cur_c2w_np=c2w,
                color_refine=color_refine,
                visualizer=None if no_vis else self.visualizer,
                cur_color_np=np.asarray(color),
                ba_anchor=ba_anchor,
            )
            if refined_c2w is not None:
                # write the BA-refined poses back through a trust-region
                # clamp (ops/pose.py:clamp_pose_update — unclamped BA's
                # pose-map feedback diverged on 1 of 3 ablation seeds):
                # window keyframes into the store, the current frame into
                # the trajectory (the tracker's next const-speed init then
                # starts from the refined pose)
                from attentive_dfprior_tpu.ops.pose import clamp_pose_update

                mcfg = self.cfg["mapping"]
                max_dt = float(mcfg.get("ba_max_dt", 0.02))
                max_rot = float(np.deg2rad(mcfg.get("ba_max_rot_deg", 1.0)))
                clamped = np.stack(
                    [
                        clamp_pose_update(f_c2w[wi], refined_c2w[wi], max_dt, max_rot)
                        for wi in range(len(refined_c2w))
                    ]
                )
                with self._kf_lock:
                    for wi, sl in enumerate(slots):
                        self.keyframes.update_pose(int(sl), clamped[wi])
                c2w = clamped[-1]
                self.estimate_c2w_list[idx] = clamped[-1]
            if self._map_key is not None:
                self._map_key = key_out
            else:
                self.key = key_out
        self.timings["map"] += time.time() - t0

        # keyframe bookkeeping (ref: src/Mapper.py:560-565)
        if (
            idx % self.keyframe_every == 0 or idx == self.n_img - 2
        ) and idx not in self.keyframes.frame_idx:
            with self._kf_lock:
                self.keyframes.add(idx, color, depth, c2w, gt_c2w)

        # revisit-gated global keyframe relaxation (loop_closure.enable;
        # framework extension — slam/loop_closure.py)
        if self.loop_closer.enable:
            key_lc = self._map_key if self._map_key is not None else self.key
            # re-localization runs the tracker's jitted scan, so under
            # parallel.split the scene must be snapshotted onto the
            # tracker's mesh first (same transport as the async publish)
            params_lc = (
                self._snapshot_for_tracker()
                if self.track_mesh is not self.mesh
                else self.params
            )
            key_lc = self.loop_closer.maybe_relax(
                idx, np.asarray(depth), c2w, self.estimate_c2w_list,
                params_lc, key_lc, kf_lock=self._kf_lock,
            )
            if self._map_key is not None:
                self._map_key = key_lc
            else:
                self.key = key_lc
        self._mapped_first = True
        if self.verbose:
            print(f"Mapping frame {idx}  losses={losses}")
        self._log_metrics(
            {"event": "map", "idx": int(idx), "losses": losses,
             "first": bool(first), "n_keyframes": len(self.keyframes)}
        )


    def _kf_depths_np(self):
        K = len(self.keyframes)
        return np.asarray(self.keyframes.depth[:K])

    # ------------------------------------------------------------------

    def run(self, start_idx: int = 0, end_idx: Optional[int] = None):
        """Main SLAM loop.

        sync_method (ref: src/Mapper.py:496-509, src/Tracker.py:170-184):
          - 'strict': mapping of frame i completes before tracking i+1 —
            exactly the reference's serialized schedule (sequential here).
          - 'loose' / 'free': REAL tracker/mapper concurrency, redesigned
            from the reference's two-process shared-CUDA-tensor polling: a
            mapper worker thread consumes mapping jobs and publishes an
            immutable scene-pytree snapshot after each mapped frame; the
            tracker reads the latest published snapshot without locks on
            the array data (pytree swap is atomic under the GIL). 'loose'
            bounds the staleness like the reference (tracker waits until
            mapping is within every_frame + every_frame//2 frames); 'free'
            never waits after the first mapped frame.
        """
        n = self.n_img if end_idx is None else min(end_idx, self.n_img)
        # generalization of the reference's hardcoded scene0050 early stop at
        # frame 4640 (ref: src/Mapper.py:576,590,604)
        stop_at = self.cfg["mapping"].get("stop_at_frame")
        if stop_at is not None:
            n = min(n, int(stop_at) + 1)
        sync = self.cfg.get("sync_method", "strict")

        if sync == "strict":
            for idx in range(start_idx, n):
                frame_idx, color, depth, gt_c2w = self.dataset[idx]
                self.gt_c2w_list[idx] = gt_c2w

                if idx == 0:
                    self.estimate_c2w_list[0] = gt_c2w
                    self._map_frame(0, color, depth, gt_c2w, gt_c2w, first=True)
                else:
                    self._track_frame(idx, color, depth, gt_c2w, self.params)
                    if not np.isfinite(gt_c2w).all():
                        continue  # skip mapping (ref: Mapper.py:521-524)
                    if idx % self.every_frame == 0 or idx == n - 1:
                        self._map_frame(
                            idx, color, depth,
                            self.estimate_c2w_list[idx], gt_c2w, first=False,
                        )
                if idx == n - 1 and self.loop_closer.final_refine_on:
                    # re-localize the whole trajectory against the final
                    # map BEFORE the last side outputs write the ckpt
                    self.key = self.loop_closer.final_refine(
                        self.dataset, self.estimate_c2w_list, self.params,
                        self.key, start_idx, n,
                    )
                self._side_outputs(idx, n)
            return self.estimate_c2w_list

        return self._run_async(start_idx, n, sync)

    def _track_frame(self, idx, color, depth, gt_c2w, params):
        t0 = time.time()
        key_in = self._track_key if self._track_key is not None else self.key
        c2w, key_out, loss = self.tracker.track(
            params, idx, color, depth, gt_c2w,
            self.estimate_c2w_list, key_in,
            visualizer=self.tracking_visualizer,
        )
        if self._track_key is not None:
            self._track_key = key_out
        else:
            self.key = key_out
        self.timings["track"] += time.time() - t0
        self.estimate_c2w_list[idx] = c2w
        if self.verbose:
            print(f"Tracking frame {idx}  loss={loss:.3f}")
        self._log_metrics({"event": "track", "idx": int(idx), "loss": float(loss)})

    def _snapshot_for_tracker(self):
        """Independent scene snapshot for the tracker thread.

        Same-mesh: a plain copy (the next mapping donates self.params'
        buffers). Split meshes (parallel.split): a cross-mesh device_put
        replicating the scene onto the tracker's devices — the copy IS the
        publish transport, and the tracker's device work then overlaps the
        mapper's for real.
        """
        if self.track_mesh is not None and self.track_mesh is not self.mesh:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.track_mesh, P())
            snap = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sh), self.params
            )
        else:
            snap = jax.tree_util.tree_map(jnp.copy, self.params)
        jax.block_until_ready(snap)
        return snap

    def _run_async(self, start_idx: int, n: int, sync: str):
        """loose/free: mapper worker thread + published scene snapshots."""
        import contextlib
        import queue
        import threading

        # Shared-MULTI-device mesh + two dispatching host threads is a
        # collective-ordering hazard: mapping_stage and track_frame both
        # carry a gradient psum over the same devices, and two programs
        # whose per-device executions interleave deadlock the all-reduce
        # rendezvous (measured on the 8-virtual-CPU mesh: 4 of 8 threads
        # arrive, XLA aborts the process). Real device concurrency is the
        # split-mesh configuration (parallel.split); on a shared mesh the
        # agents' DEVICE work must serialize — which is what a single chip
        # does physically anyway (ASYNC_r04's loose ~= strict note).
        serialize = (
            self.mesh is not None
            and self.track_mesh is self.mesh
            and len(self.mesh.devices.flat) > 1
        )
        dispatch_lock = threading.Lock() if serialize else None

        def dispatch_guard():
            return (
                dispatch_lock
                if dispatch_lock is not None
                else contextlib.nullcontext()
            )

        jobs: "queue.Queue" = queue.Queue()
        # The published snapshot must never alias self.params: every mapping
        # job donates self.params' buffers (mapping_stage donate_argnums), so
        # the seed snapshot is an independent copy too — on resume
        # (start_idx > 0) the tracker starts from it before any map job runs.
        seed_snap = self._snapshot_for_tracker()
        state = {
            "published": seed_snap,  # latest snapshot for the tracker
            # resume: treat everything before start_idx as already mapped so
            # the 'loose' staleness gate can make progress
            "last_mapped": start_idx - 1,
            "published_idx": start_idx - 1,
            "consumed": True,  # has the tracker read the current snapshot?
            "error": None,
        }
        pub_cv = threading.Condition()
        # independent per-thread PRNG streams (see __init__ note)
        self.key, map_key, track_key = jax.random.split(self.key, 3)
        self._map_key, self._track_key = map_key, track_key

        def mapper_worker():
            try:
                while True:
                    job = jobs.get()
                    if job is None:
                        return
                    midx, mcolor, mdepth, mgt, first = job
                    with dispatch_guard():
                        self._map_frame(
                            midx, mcolor, mdepth,
                            self.estimate_c2w_list[midx], mgt, first=first,
                        )
                    # Publish an independent snapshot: the next mapping
                    # donates self.params, which would invalidate buffers
                    # the tracker might still be reading. Publish-on-demand:
                    # if the tracker never consumed the previous snapshot,
                    # skip the (full-scene-copy) publish — the old snapshot
                    # stays valid, just one map staler — unless staleness
                    # would exceed 2*every_frame mapped frames.
                    with pub_cv:
                        skip = (
                            not state["consumed"]
                            and midx - state["published_idx"]
                            < 2 * self.every_frame
                        )
                    if skip:
                        with pub_cv:
                            state["last_mapped"] = midx
                            pub_cv.notify_all()
                        self._log_metrics(
                            {"event": "publish_skip", "idx": int(midx)}
                        )
                        continue
                    t0 = time.time()
                    snap = self._snapshot_for_tracker()
                    publish_s = time.time() - t0
                    with pub_cv:
                        state["published"] = snap
                        state["published_idx"] = midx
                        state["consumed"] = False
                        state["last_mapped"] = midx
                        pub_cv.notify_all()
                    self._log_metrics(
                        {"event": "publish", "idx": int(midx),
                         "publish_s": round(publish_s, 4)}
                    )
            except BaseException as e:  # surface crashes to the main thread
                with pub_cv:
                    state["error"] = e
                    pub_cv.notify_all()

        worker = threading.Thread(target=mapper_worker, daemon=True)
        worker.start()
        # loose staleness bound (role of ref: src/Tracker.py:176-181)
        max_lag = self.every_frame + self.every_frame // 2

        def wait_until(cond):
            with pub_cv:
                while not cond() and state["error"] is None:
                    pub_cv.wait(timeout=0.05)
                if state["error"] is not None:
                    raise state["error"]

        def snapshot():
            with pub_cv:
                state["consumed"] = True
                return state["published"]

        try:
            for idx in range(start_idx, n):
                frame_idx, color, depth, gt_c2w = self.dataset[idx]
                self.gt_c2w_list[idx] = gt_c2w

                if idx == 0:
                    self.estimate_c2w_list[0] = gt_c2w
                    jobs.put((0, color, depth, gt_c2w, True))
                    # both modes wait for the first map before tracking
                    # (ref: src/Tracker.py:277-281 mapping_first_frame gate)
                    wait_until(lambda: state["last_mapped"] >= 0)
                else:
                    if sync == "loose":
                        wait_until(
                            lambda: state["last_mapped"] >= idx - max_lag
                        )
                    with dispatch_guard():
                        self._track_frame(
                            idx, color, depth, gt_c2w, snapshot()
                        )
                    if not np.isfinite(gt_c2w).all():
                        continue
                    if idx % self.every_frame == 0 or idx == n - 1:
                        jobs.put((idx, color, depth, gt_c2w, False))
                        if idx == n - 1:  # final frame: complete the map
                            wait_until(lambda: state["last_mapped"] >= idx)
                            with pub_cv:
                                stale = (
                                    state["published_idx"]
                                    < state["last_mapped"]
                                )
                            if stale:
                                # the final publish was skipped; the worker
                                # is idle (no jobs pending) so self.params
                                # is stable — snapshot it for side outputs
                                snap = self._snapshot_for_tracker()
                                with pub_cv:
                                    state["published"] = snap
                                    state["published_idx"] = idx
                                    state["consumed"] = False
                if idx == n - 1 and self.loop_closer.final_refine_on:
                    # the worker is idle here (last map job completed and
                    # awaited above), so the published snapshot is final
                    self._track_key = self.loop_closer.final_refine(
                        self.dataset, self.estimate_c2w_list, snapshot(),
                        self._track_key, start_idx, n,
                    )
                self._side_outputs(idx, n, params=snapshot())
        finally:
            jobs.put(None)
            worker.join(timeout=600)
            self._map_key = self._track_key = None
        return self.estimate_c2w_list

    def _side_outputs(self, idx: int, n: int, params=None):
        # async (loose/free) callers pass the published snapshot:
        # self.params may reference donated buffers mid-mapping, and
        # keyframe reads are serialized against the mapper thread
        if params is None:
            params = self.params

        # side outputs (ref: src/Mapper.py:574-602)
        last = idx == n - 1
        with self._kf_lock:
            kf_idx = list(self.keyframes.frame_idx)
            kf_poses = self.keyframes.poses_np()
            kf_gt = np.array(self.keyframes.gt_c2w[: len(kf_idx)])
            kf_depths = self._kf_depths_np()
            # snapshot: the mapper worker mutates this dict concurrently
            selected_kf = dict(self.selected_keyframes)
        if (
            (idx % self.ckpt_freq == 0 and not (idx == 0 and self.no_log_on_first_frame))
            or last
        ):
            self.logger.log(
                idx,
                params,
                self.estimate_c2w_list,
                self.gt_c2w_list,
                kf_idx,
                kf_poses,
                keyframe_gt_c2w=kf_gt,
                selected_keyframes=(
                    selected_kf if self.save_selected_keyframes_info else None
                ),
            )
        if (
            idx % self.mesh_freq == 0
            and not (idx == 0 and self.no_mesh_on_first_frame)
            and len(kf_idx) > 0
        ):
            self.mesher.get_mesh(
                f"{self.output}/mesh/{idx:05d}_mesh.ply",
                params,
                self.tsdf_volume_mesh,
                kf_depths,
                kf_poses,
                self.estimate_c2w_list,
                idx,
            )
        if last and len(kf_idx) > 0:
            self.mesher.get_mesh(
                f"{self.output}/mesh/final_mesh.ply",
                params,
                self.tsdf_volume_mesh,
                kf_depths,
                kf_poses,
                self.estimate_c2w_list,
                idx,
            )
            if self.eval_rec:
                self.mesher.get_mesh(
                    f"{self.output}/mesh/final_mesh_eval_rec.ply",
                    params,
                    self.tsdf_volume_mesh,
                    kf_depths,
                    kf_poses,
                    self.estimate_c2w_list,
                    idx,
                    get_mask_use_all_frames=True,
                )
