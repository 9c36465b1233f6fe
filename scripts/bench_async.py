#!/usr/bin/env python
"""Measure async (loose) vs strict sync mode on the real chip.

(VERDICT r03 item 9.) The reference's concurrency claim is its 2-process
tracker ∥ mapper design (ref: src/DF_Prior.py:297-311); our loose/free modes
reproduce it with a mapper worker thread + immutable snapshot publication.
bench.py times strict alternation only — this harness runs the SAME short
synthetic SLAM workload under sync_method strict and loose on the real
backend and reports, from the per-event wall-clock stamps in metrics.jsonl:

  - total wall time over the measured frames
  - per-tracked-frame intervals (median)
  - publish count / publish_s overhead / publish_skips (loose)

Honest-reporting note: on this single shared chip behind a ~22 ms relay,
device work serializes regardless of host threading — the async win here is
host-side overlap (sampling, dispatch, snapshot copies) only, and the relay
RTT can hide it. The JSON records whatever is true.

Run: python scripts/bench_async.py [--frames 20] [--out ASYNC_r04.json]
"""

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_mode(sync: str, frames: int, out_root: str, parallel_cfg=None, tag=None,
             small=False):
    from attentive_dfprior_tpu.config import default_config_path, load_config
    from attentive_dfprior_tpu.slam.system import SLAMSystem

    cfg = load_config("configs/Synthetic/room_tracking.yaml", default_config_path())
    cfg["seed"] = 0
    cfg["sync_method"] = sync
    cfg["data"]["n_frames"] = frames
    if small:
        # CPU-mesh runs: the hires production graph compiles for tens of
        # minutes on the host backend; the split measurement is relative
        # (plumbing + scheduling), so shrink to the multihost-smoke tiny
        # workload (scripts/multihost_smoke.py:_slam_traj_and_losses)
        cfg["data"]["arc_degrees"] = 10
        cfg["cam"].update(H=36, W=48, fx=36.0, fy=36.0, cx=23.5, cy=17.5)
        cfg["mapping"].update(
            iters=8, iters_first=8, pixels=64, every_frame=5,
            keyframe_every=5, color_refine=False, mesh_freq=10**6,
            ckpt_freq=10**6, vis_freq=10**6, vis_inside_freq=10**6,
            frustum_feature_selection=False, BA=False,
        )
        cfg["tracking"].update(
            pixels=64, iters=4, ignore_edge_W=4, ignore_edge_H=4,
            vis_freq=10**6, vis_inside_freq=10**6,
        )
        cfg["rendering"].update(N_samples=12, N_surface=4)
        cfg["tsdf"]["voxel_size"] = 0.05
        cfg["pretrained_decoders"]["low_high"] = ""
        cfg["verbose"] = False
    if parallel_cfg is not None:
        cfg["parallel"] = parallel_cfg
    out = os.path.join(out_root, tag or sync)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    np.random.seed(0)
    slam = SLAMSystem(cfg, output=out)
    slam._side_outputs = lambda *a, **k: None  # no meshing/ckpt side work
    t0 = time.time()
    slam.run()
    wall = time.time() - t0

    events = []
    with open(os.path.join(out, "metrics.jsonl")) as f:
        for line in f:
            events.append(json.loads(line))
    tracks = [e for e in events if e.get("event") == "track" and "t" in e]
    maps = [e for e in events if e.get("event") == "map" and "t" in e]
    pubs = [e for e in events if e.get("event") == "publish"]
    skips = [e for e in events if e.get("event") == "publish_skip"]
    track_iv = np.diff([e["t"] for e in tracks]) if len(tracks) > 1 else []
    rec = {
        "sync_method": sync,
        "parallel": parallel_cfg,
        "frames": frames,
        "wall_s": round(wall, 2),
        "n_tracked": len(tracks),
        "n_mapped": len(maps),
        "track_interval_median_s": (
            round(float(np.median(track_iv)), 4) if len(track_iv) else None
        ),
        "track_interval_p90_s": (
            round(float(np.percentile(track_iv, 90)), 4) if len(track_iv) else None
        ),
        "publishes": len(pubs),
        "publish_skips": len(skips),
        "publish_s_total": round(sum(e.get("publish_s", 0.0) for e in pubs), 3),
    }
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--out", default="ASYNC_r04.json")
    ap.add_argument("--out-root", default="/tmp/bench_async")
    ap.add_argument("--split", default=None,
                    help="'m,t' mapper/tracker device split — adds "
                    "loose_split (+ a dp-parallel strict/loose pair) runs "
                    "and forces the (m+t)-virtual-CPU-device mesh (this "
                    "image's sitecustomize ignores JAX_PLATFORMS=cpu in "
                    "the env, so the script must switch platforms itself "
                    "before backend init) (VERDICT r04 item 3)")
    args = ap.parse_args()

    if args.split:
        n_virt = sum(int(x) for x in args.split.split(","))
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_virt}"
            ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    from attentive_dfprior_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if args.split:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # truthful relay mode before ANY timing (see bench.py module docstring)
    float(jnp.zeros(()))

    results = {}
    # strict first (pays the compiles), then loose reuses the cache; then a
    # second strict rep so compile warmup does not bias the comparison
    reps = [("strict_warm", "strict", None), ("loose", "loose", None),
            ("strict", "strict", None)]
    if args.split:
        m, t = (int(x) for x in args.split.split(","))
        n = m + t
        dp = {"enable": True, "n_devices": n}
        split = {"enable": True, "split": {"map": m, "track": t}}
        # each topology compiles fresh sharded graphs — run a warm rep
        # first so the measured rep is steady-state, as with strict_warm
        reps += [
            ("strict_dp_warm", "strict", dp),
            ("loose_dp_warm", "loose", dp),
            ("loose_split_warm", "loose", split),
            ("strict_dp", "strict", dp),
            ("loose_dp", "loose", dp),
            ("loose_split", "loose", split),
        ]
    for tag, sync, pcfg in reps:
        rec = run_mode(sync, args.frames, args.out_root, pcfg, tag,
                       small=bool(args.split))
        rec["small_workload"] = bool(args.split)
        results[tag] = rec
        print(json.dumps({tag: rec}), flush=True)

    s, l = results["strict"], results["loose"]
    summary = {
        "device_kind": jax.devices()[0].device_kind,
        "backend": jax.default_backend(),
        "speedup_wall": round(s["wall_s"] / max(l["wall_s"], 1e-9), 3),
        "note": (
            "single shared chip behind a remote relay: device work "
            "serializes across the mapper thread and tracker; the async win "
            "is host-side overlap only (see module docstring)"
        ),
    }
    if "loose_split" in results:
        summary["speedup_split_vs_strict_dp"] = round(
            results["strict_dp"]["wall_s"]
            / max(results["loose_split"]["wall_s"], 1e-9), 3)
        summary["speedup_split_vs_loose_dp"] = round(
            results["loose_dp"]["wall_s"]
            / max(results["loose_split"]["wall_s"], 1e-9), 3)
        summary["split_note"] = (
            "device-split agents (parallel.split) measured on the "
            "8-VIRTUAL-CPU-device mesh (tiny workload, steady-state reps "
            "after per-topology warmup). Two caveats on any split win "
            "here: virtual devices share host cores, and splitting 6+2 "
            "also shrinks each program's collective participant count, "
            "which is itself cheaper on the CPU backend — the clean "
            "multi-chip win condition is real hardware (unavailable, one "
            "chip). loose_dp runs under the shared-mesh dispatch lock "
            "(slam/system.py:_run_async): without it, two host threads' "
            "psum programs interleave on the same devices and deadlock "
            "the all-reduce rendezvous (measured before the fix)"
        )
    payload = {"runs": results, "summary": summary,
               "when": time.strftime("%Y-%m-%d %H:%M:%S")}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"async_bench": summary, "out": args.out}))


if __name__ == "__main__":
    main()
