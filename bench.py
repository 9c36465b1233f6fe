#!/usr/bin/env python
"""Benchmark: rays/s/chip on the map+track hot loop.

Two workloads (VERDICT r03 item 8):
  - replica (headline): the reference's Replica room0 shape
  - scannet: the reference's LARGER ScanNet shape — 5000 rays x 60 mapping
    iters, window 10, tracking 50 iters x 1000 rays, scene0000-scale
    bounds/grids and a 4/256 m prior over a 13 x 13.5 x 7.5 m volume
    (ref: configs/ScanNet/scannet.yaml:20-23, scene0000.yaml:3). Validates
    one-chip feasibility at the big configuration and records rays/s +
    peak device memory. Default --workload both: the printed JSON line is
    the replica headline with a "scannet" sub-object.

Runs on the real TPU (does not override JAX_PLATFORMS). The workload matches
the reference's Replica configuration exactly (SURVEY §6 / BASELINE.md):
  - mapping: 60 joint iterations x 1000 rays x 48 samples/ray (25 low /
    12 high / 23 color stage iterations), room0-scale feature grids and a
    full-resolution (4/256 m) TSDF prior volume
  - tracking: 10 iterations x 200 rays (color stage, pose-only grads)

Primary metric: rays/s/chip over the combined map+track work for one
5-frame SLAM cycle (1 mapped frame + 5 tracked frames, every_frame=5).

MEASUREMENT CONTRACT (round-3 discovery; every earlier recorded number —
BENCH_r01 2.05M, BENCH_r02 633k, and ad-hoc re-runs — was an artifact):
this TPU sits behind a shared remote relay whose DEFAULT mode acknowledges
dispatches without completing them; in that mode ``block_until_ready``
returns ~0 ms for a matmul chain with a 1.1 s physics floor (220 TFLOP at
the chip's 197 TFLOP/s bf16 peak). One host device_get (np.asarray/float
of ANY device array) irreversibly flips the process into a truthful
synchronous mode where the same chain blocks for 1.20 s = 93% of peak.
This benchmark therefore forces truthful mode immediately after warmup and
measures everything there, paying ~25 ms relay RTT per jit dispatch; the
per-dispatch RTT is measured separately and a relay-overhead-corrected
device-time estimate is reported alongside the raw number.

vs_baseline: ratio to the reference implementation's estimated GPU
throughput. The reference publishes no numbers (BASELINE.md); NICE-SLAM-
lineage systems of this exact workload map a frame (60x1000 rays) in ~5 s
on a desktop GPU => ~12k rays/s. We use 12_000 rays/s as the documented
baseline estimate; the north-star target is >=5x (vs_baseline >= 5).
"""

import argparse
import json
import time

import numpy as np

WORKLOADS = {
    # bounds/cam/batch shapes of the reference configs (SURVEY §6)
    "replica": dict(
        bound=[[-2.9, 8.94], [-3.2, 5.76], [-3.5, 3.54]],
        cam=dict(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5, cy=339.5),
        F=5, map_iters={"low": 25, "high": 12, "color": 23}, pixels=1000,
        track_iters=10, track_pixels=200,
    ),
    "scannet": dict(
        bound=[[-2.0, 11.0], [-2.0, 11.5], [-2.0, 5.5]],
        cam=dict(H=480, W=640, fx=577.590698, fy=578.729797,
                 cx=318.905426, cy=242.683609),
        F=10, map_iters={"low": 25, "high": 12, "color": 23}, pixels=5000,
        track_iters=50, track_pixels=1000,
    ),
}


def measure_workload(name: str, reps: int = 5, after_warmup=None):
    """Compile + time one SLAM cycle of the given workload shape.

    ``after_warmup`` (first workload only) forces the truthful relay mode
    and measures RTT/calibration between compile and the timed reps; the
    mode is process-wide and sticky, so later workloads need nothing.
    """
    import jax
    import jax.numpy as jnp

    from attentive_dfprior_tpu.models.scene import SceneConfig, init_scene
    from attentive_dfprior_tpu.ops.adam import adam_init
    from attentive_dfprior_tpu.render.renderer import RenderConfig
    from attentive_dfprior_tpu.slam.mapper import StageLRs, mapping_stage
    from attentive_dfprior_tpu.slam.tracker import track_frame
    from attentive_dfprior_tpu.camera import Camera

    w = WORKLOADS[name]
    bound = np.array(w["bound"])
    scfg = SceneConfig(
        bound=bound, c_dim=32, low_grid_len=0.32, high_grid_len=0.16,
        color_grid_len=0.16, fix_high=False, fix_color=False,
    )
    key = jax.random.PRNGKey(0)
    params = init_scene(key, scfg)
    mem0 = _mem_stats(jax)

    # full-resolution TSDF prior (4/256 m voxels), bf16-free f32 like the ref
    voxel = 4.0 / 256
    dims = tuple(int(np.ceil((bound[i, 1] - bound[i, 0]) / voxel)) for i in range(3))
    tsdf_np = np.random.default_rng(0).uniform(-1, 1, size=dims).astype(np.float32)
    # production layout: wide Z-rows (6.6x faster prior sampling on TPU,
    # scripts/bench_tsdf_gather.py; slam/system.py converts the same way)
    from attentive_dfprior_tpu.ops.grid_sample import tsdf_to_rows

    tsdf = tsdf_to_rows(tsdf_np)
    tsdf_bnds = jnp.asarray(bound, dtype=jnp.float32)
    jbound = jnp.asarray(bound, dtype=jnp.float32)

    cam = Camera(**w["cam"])
    rcfg = RenderConfig(N_samples=32, N_surface=16)

    # synthetic frame content at the workload's native resolution
    rng = np.random.default_rng(1)
    F = w["F"]  # mapping window (keyframes + current)
    frames_color = jnp.asarray(rng.uniform(0, 1, (F, cam.H, cam.W, 3)), jnp.float32)
    frames_depth = jnp.asarray(rng.uniform(0.5, 4.0, (F, cam.H, cam.W)), jnp.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [2.0, 1.0, 0.0]
    frames_c2w = jnp.asarray(np.tile(c2w, (F, 1, 1)))

    lrs = StageLRs(decoders=5e-3, mlp=5e-3, low=5e-3, high=5e-3, color=5e-3)
    MAP_ITERS = w["map_iters"]
    PIXELS = w["pixels"]
    pixs_per_image = PIXELS // F

    def run_mapping_cycle(params):
        astate = adam_init(params)
        nonlocal key
        for stage, n in MAP_ITERS.items():
            keys = jax.random.split(jax.random.fold_in(key, hash(stage) % 2**31), n)
            wf = jnp.zeros((n,), jnp.float32)
            params, astate, losses = mapping_stage(
                params, astate, frames_color, frames_depth, frames_c2w,
                None, tsdf, tsdf_bnds, jbound, keys, wf, lrs, stage,
                pixs_per_image, cam, rcfg, (False, False), 0.2, False,
            )
        return params, losses

    TRACK_ITERS, TRACK_PIXELS = w["track_iters"], w["track_pixels"]
    cam_tensor = jnp.asarray([1.0, 0.0, 0.0, 0.0, 2.0, 1.0, 0.0], jnp.float32)

    def run_tracking(params, k):
        best, losses, _, _ = track_frame(
            params, cam_tensor, frames_color[0], frames_depth[0],
            tsdf, tsdf_bnds, jbound, k, cam, rcfg,
            TRACK_PIXELS, TRACK_ITERS, 100, 100, True, True, 0.5, 1e-3,
        )
        return losses

    # ---- warmup / compile ----
    # NOTE: block on the FULL output pytree — through the remote-TPU relay,
    # blocking on a small array alone returns before the big donated outputs
    # are complete and under-reports time by orders of magnitude.
    t0 = time.time()
    params, losses = run_mapping_cycle(params)
    jax.block_until_ready((params, losses))
    tl = run_tracking(params, jax.random.PRNGKey(3))
    jax.block_until_ready(tl)
    compile_s = time.time() - t0

    if after_warmup is not None:
        after_warmup()

    # ---- timed: one SLAM cycle = 1 mapped frame + 5 tracked frames ----
    # >=reps independent repetitions of the WHOLE measurement; the JSON
    # carries median + min/max so a contended run is visible instead of
    # silently recorded as the headline number.
    rep_times = []
    for r in range(reps):
        t0 = time.time()
        params, losses = run_mapping_cycle(params)
        for i in range(5):
            tl = run_tracking(params, jax.random.PRNGKey(10 + r * 5 + i))
        jax.block_until_ready((params, losses, tl))
        rep_times.append(time.time() - t0)

    rays_per_cycle = (
        PIXELS * sum(MAP_ITERS.values()) + 5 * TRACK_PIXELS * TRACK_ITERS
    )
    cycle_med = float(np.median(rep_times))
    mem1 = _mem_stats(jax)
    rec = {
        "workload": name,
        "rays_per_cycle": rays_per_cycle,
        "cycle_s_median": round(cycle_med, 4),
        "rep_times_s": [round(t, 4) for t in rep_times],
        "rays_per_s": round(rays_per_cycle / cycle_med, 1),
        "rays_per_s_min": round(rays_per_cycle / max(rep_times), 1),
        "rays_per_s_max": round(rays_per_cycle / min(rep_times), 1),
        "compile_s": round(compile_s, 1),
        "compile_cache": _cache_state(),
        "samples_per_ray": rcfg.N_samples + rcfg.N_surface,
        "tsdf_voxels": int(np.prod(dims)),
    }
    if mem1 is not None:
        rec["device_peak_mem_gb"] = round(mem1 / 2**30, 2)
    elif mem0 is None:
        rec["device_peak_mem_gb"] = None  # relay does not expose memory_stats

    # analytic FLOPs/point for the MFU estimate (see main)
    def _mat_flops(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(2 * x.size for x in leaves if getattr(x, "ndim", 0) == 2)

    rec["_flops_fwd_per_point"] = sum(
        _mat_flops(params[k]) for k in ("low", "high", "color", "mlp")
    )
    return rec


_CACHE_STATE0 = None


def _cache_state():
    """Persistent-compile-cache evidence for the artifact: dir + whether this
    process started warm (entries already present at process start =>
    compile_s is a warm-start time, not the ~46 s cold ScanNet compile).
    Snapshotted ONCE on first call (before any warmup compile finishes
    writing new entries would still race; main() calls this right after
    enabling the cache, before building any jitted graph)."""
    global _CACHE_STATE0
    if _CACHE_STATE0 is None:
        import glob
        import os

        d = os.environ.get(
            "DFPRIOR_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "dfprior_jax"),
        )
        n = len(glob.glob(os.path.join(d, "*"))) if os.path.isdir(d) else 0
        _CACHE_STATE0 = {"dir": d, "entries_at_start": n, "warm_start": n > 0}
    return _CACHE_STATE0


def _mem_stats(jax):
    """Peak device memory in bytes, when the backend exposes it."""
    try:
        st = jax.local_devices()[0].memory_stats()
        return int(st.get("peak_bytes_in_use", st.get("bytes_in_use", 0)))
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--workload", default="both", choices=["replica", "scannet", "both"],
        help="replica = reference room0 shape (headline); scannet = the "
        "larger reference shape (5000 rays x window 10); both = headline "
        "JSON with a scannet sub-object",
    )
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from attentive_dfprior_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    _cache_state()  # snapshot warm/cold before any compilation

    state = {}

    def after_warmup():
        # ---- force TRUTHFUL (synchronous-completion) relay mode ----
        # (see module docstring: without this, block_until_ready
        # acknowledges without completing and every timing would be fiction)
        float(jnp.zeros(()))

        # ---- relay RTT probe: per-dispatch overhead in truthful mode ----
        @jax.jit
        def _nop(x):
            return x + 1.0

        nop_x = jnp.zeros((8, 128), jnp.float32)
        _nop(nop_x).block_until_ready()
        rtt_times = []
        for _ in range(10):
            t0 = time.time()
            _nop(nop_x).block_until_ready()
            rtt_times.append(time.time() - t0)
        state["rtt_s"] = float(np.median(rtt_times))

        # ---- fixed-work calibration (VERDICT r2 weak #1) ----
        # 50 chained 4096^2 bf16 matmuls = 6.9 TFLOP ~= 35 ms at peak + RTT.
        # Detects cross-tenant contention on this shared chip: a healthy run
        # reports ~55-70 ms; multiples of that mean THIS run was contended
        # and the headline number under-reports the framework.
        calib_a = jnp.ones((4096, 4096), jnp.bfloat16)

        @jax.jit
        def _calib(a):
            x = a
            for _ in range(50):
                x = jnp.dot(x, a, preferred_element_type=jnp.bfloat16)
            return x

        _calib(calib_a).block_until_ready()  # compile
        calib_times = []
        for _ in range(5):
            t0 = time.time()
            _calib(calib_a).block_until_ready()
            calib_times.append(time.time() - t0)
        state["calib_times"] = calib_times

    primary = "replica" if args.workload in ("replica", "both") else "scannet"
    rec = measure_workload(primary, reps=args.reps, after_warmup=after_warmup)

    rtt_s = state["rtt_s"]
    calib_times = state["calib_times"]
    cycle_med = rec["cycle_s_median"]
    rays_per_cycle = rec["rays_per_cycle"]
    rays_per_s = rays_per_cycle / cycle_med

    # relay-overhead-corrected device-time estimate: in truthful mode every
    # jit dispatch pays ~rtt_s of relay round-trip that a locally-attached
    # TPU host would not. Dispatches per cycle: 3 mapping_stage + 1
    # adam_init + 3 key fold/split pairs + 5 track_frame + 5 PRNGKey ~= 20.
    DISPATCHES_PER_CYCLE = 20
    cycle_device_est = max(1e-9, cycle_med - DISPATCHES_PER_CYCLE * rtt_s)
    rays_per_s_device_est = rays_per_cycle / cycle_device_est

    # ---- honest accounting extras (VERDICT r1 item 8) ----
    samples_per_ray = rec["samples_per_ray"]
    point_evals_per_s = rays_per_s_device_est * samples_per_ray
    est_flops_per_s = 3.0 * rec["_flops_fwd_per_point"] * point_evals_per_s
    # Per-chip peak from the ACTUAL device kind (VERDICT r2 weak #7).
    dev_kind = jax.devices()[0].device_kind
    PEAK_BF16 = {  # FLOP/s per chip (published bf16 matmul peak)
        "TPU v4": 2.75e14,
        "TPU v5 lite": 1.97e14,
        "TPU v5e": 1.97e14,
        "TPU v5p": 4.59e14,
        "TPU v5": 4.59e14,
        "TPU v6 lite": 9.18e14,
        "TPU v6e": 9.18e14,
    }
    peak = next(
        (v for k, v in PEAK_BF16.items() if k.lower() in dev_kind.lower()),
        2.2e14,
    )
    est_mfu = est_flops_per_s / peak

    BASELINE_RAYS_PER_S = 12_000.0  # documented ESTIMATE, see docstring
    spread = (rec["rays_per_s_max"] - rec["rays_per_s_min"]) / rays_per_s
    payload = {
        "metric": "rays_per_s_per_chip_map_track",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 2),
        "vs_baseline_note": (
            "denominator is a documented estimate (12k rays/s, "
            "NICE-SLAM-lineage desktop GPU); the reference repo "
            "publishes no numbers (BASELINE.md)"
        ),
        "workload": primary,
        "reps": args.reps,
        "median": round(rays_per_s, 1),
        "min": rec["rays_per_s_min"],
        "max": rec["rays_per_s_max"],
        "spread_frac": round(spread, 3),
        "cycle_s_median": cycle_med,
        "relay_rtt_ms": round(rtt_s * 1e3, 2),
        "rays_per_s_device_est": round(rays_per_s_device_est, 1),
        "device_est_note": (
            "cycle time minus ~20 dispatches x relay RTT: what a "
            "locally-attached TPU host would see"
        ),
        "calib_matmul_ms_median": round(float(np.median(calib_times)) * 1e3, 2),
        "calib_matmul_ms_max": round(max(calib_times) * 1e3, 2),
        "calib_healthy_envelope_ms": "55-70",
        "device_kind": dev_kind,
        "point_evals_per_s": round(point_evals_per_s, 1),
        "est_model_flops_per_s": round(est_flops_per_s, 1),
        "est_mfu_vs_chip_bf16_peak": round(est_mfu, 4),
        "assumed_peak_flops": peak,
    }
    if "device_peak_mem_gb" in rec:
        payload["device_peak_mem_gb"] = rec["device_peak_mem_gb"]

    if args.workload == "both":
        srec = measure_workload("scannet", reps=args.reps)
        s_cycle_dev = max(1e-9, srec["cycle_s_median"] - DISPATCHES_PER_CYCLE * rtt_s)
        srec["rays_per_s_device_est"] = round(srec["rays_per_cycle"] / s_cycle_dev, 1)
        srec.pop("_flops_fwd_per_point", None)
        payload["scannet"] = srec

    payload.pop("_flops_fwd_per_point", None)
    print(json.dumps(payload))
    import sys

    print(
        f"# compile={rec['compile_s']}s cycle_med={cycle_med:.2f}s "
        f"reps={rec['rep_times_s']} rays/cycle={rays_per_cycle} "
        f"backend={jax.default_backend()} device={dev_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
