#!/usr/bin/env python
"""Scaling-efficiency harness: mapping rays/s vs device count (north star:
>=80% rays/s efficiency from 1 chip to N>=2).

Measures the PRODUCTION data-parallel mapping stage (slam/mapper.py
``mapping_stage`` — scanned multi-iteration loop, ray batch sharded over a
1-D dp mesh, replicated scene params, XLA-inserted gradient all-reduce) for
the two reference workload shapes:

  - Replica: 1000 rays/iter (configs/df_prior.yaml:62-64)
  - ScanNet: 5000 rays/iter (configs/ScanNet/scannet.yaml:20-23)

Three measurement modes (VERDICT r2 'Next round' item 4):
  - strong: global ray batch fixed, per-device work shrinks with n.
    Efficiency(n) = rays_per_s(n) / (n * rays_per_s(1)).
  - weak: rays PER DEVICE fixed (--pixels is per-device), global batch
    grows with n. Same efficiency formula (ideal rays/s is linear in n),
    but per-device work — and thus the compute:communication ratio — stays
    constant, which is the regime that actually predicts real-slice
    behavior for this workload.
  - batch growth (--accum k): k-fold larger ray batch per Adam step with
    1/k as many optimizer steps (same total rays). Fewer gradient
    all-reduces per ray => higher efficiency, at the cost of a k-fold
    larger effective batch (staleness of the Adam state between updates).

Plus an ANALYTIC COMM MODEL (emitted into the JSON): the mapping step
psums every gradient leaf (grids dominate) each iteration; the model
computes ring-all-reduce bytes/step from the actual parameter pytree and
predicts real-slice efficiency from the measured single-chip step time
(bench.py / scripts/profile_mapping.py) and the ICI bandwidth of the
recorded device kind. Virtual-CPU wall-clock CANNOT show real speedup
(devices share 2 host cores — recorded caveat); the comm model is the
bridge from plumbing-validation to a hardware prediction.

Usage:
    python bench_scaling.py [--devices 1,2,4,8] [--pixels 1000,5000]
                            [--mode strong|weak] [--accum 1,5]
                            [--iters 6] [--reps 3] [--out SCALING.json]
                            [--platform cpu|native] [--quick]
"""

import argparse
import json
import os
import subprocess
import sys
import time


def child_measure(n_devices: int, pixels: int, n_iters: int, reps: int,
                  platform: str, accum_k: int = 1) -> dict:
    """Measure rays/s of the production mapping stage on an n-device mesh.

    ``pixels`` is the GLOBAL base ray batch per iteration (the parent scales
    it for weak mode). ``accum_k`` is passed straight to the PRODUCTION
    ``mapping_stage(accum=...)`` knob (parallel.accum): one Adam step /
    all-reduce per k-fold-larger sampled batch.
    """
    if platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np

    from attentive_dfprior_tpu.camera import Camera
    from attentive_dfprior_tpu.models.scene import SceneConfig, init_scene
    from attentive_dfprior_tpu.ops.adam import adam_init
    from attentive_dfprior_tpu.parallel.sharding import (
        make_mesh,
        ray_sharding,
        replicate,
    )
    from attentive_dfprior_tpu.render.renderer import RenderConfig
    from attentive_dfprior_tpu.slam.mapper import StageLRs, mapping_stage
    from attentive_dfprior_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}"
    )
    mesh = make_mesh(devices)
    rsh = ray_sharding(mesh) if n_devices > 1 else None

    # room0 bounds, coarse-enough grids/prior to keep CPU compile sane;
    # identical across n so ratios are meaningful
    bound = np.array([[-2.9, 8.94], [-3.2, 5.76], [-3.5, 3.54]])
    scfg = SceneConfig(
        bound=bound, c_dim=32, low_grid_len=0.32, high_grid_len=0.16,
        color_grid_len=0.16, fix_high=False, fix_color=False,
    )
    params = init_scene(jax.random.PRNGKey(0), scfg)
    # bytes the dp gradient all-reduce moves per optimizer step (every
    # leaf gets a grad; the grids dominate) — feeds the parent's comm model
    grad_bytes = int(sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params)
    ))
    voxel = 0.0625
    dims = tuple(int(np.ceil((bound[i, 1] - bound[i, 0]) / voxel)) for i in range(3))
    tsdf = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, size=dims).astype(np.float32)
    )
    tsdf_bnds = jnp.asarray(bound, dtype=jnp.float32)
    jbound = jnp.asarray(bound, dtype=jnp.float32)

    cam = Camera(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5, cy=339.5)
    rcfg = RenderConfig(N_samples=32, N_surface=16)
    F = 5
    rng = np.random.default_rng(1)
    frames_color = jnp.asarray(rng.uniform(0, 1, (F, cam.H, cam.W, 3)), jnp.float32)
    frames_depth = jnp.asarray(rng.uniform(0.5, 4.0, (F, cam.H, cam.W)), jnp.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [2.0, 1.0, 0.0]
    frames_c2w = jnp.asarray(np.tile(c2w, (F, 1, 1)))

    params = replicate(mesh, params)
    tsdf = replicate(mesh, tsdf)

    lrs = StageLRs(decoders=5e-3, mlp=5e-3, low=5e-3, high=5e-3, color=5e-3)
    pixs_per_image = max(1, pixels // F)

    def one_stage(params):
        astate = adam_init(params)
        keys = jax.random.split(jax.random.PRNGKey(2), n_iters)
        wf = jnp.zeros((n_iters,), jnp.float32)
        return mapping_stage(
            params, astate, frames_color, frames_depth, frames_c2w,
            None, tsdf, tsdf_bnds, jbound, keys, wf, lrs, "color",
            pixs_per_image, cam, rcfg, (False, False), 0.2, False, rsh,
            None, accum_k,
        )

    # warmup/compile
    t0 = time.time()
    params, astate, losses = one_stage(params)
    jax.block_until_ready((params, astate, losses))
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(reps):
        params, astate, losses = one_stage(params)
    jax.block_until_ready((params, astate, losses))
    elapsed = time.time() - t0

    rays = pixs_per_image * F * accum_k * n_iters * reps
    return {
        "n_devices": n_devices,
        "pixels": pixs_per_image * F * accum_k,
        "rays_per_s": rays / elapsed,
        "compile_s": compile_s,
        "elapsed_s": elapsed,
        "grad_bytes_per_step": grad_bytes,
        "backend": jax.default_backend(),
    }


# published per-chip ICI bandwidth (bytes/s, bidirectional, ONE torus
# axis — a 1-D dp ring uses one axis). Source: jax-ml.github.io/scaling-book
# hardware table; the prediction's sensitivity to a 2x error here is
# reported alongside.
ICI_BW_BIDI = {
    "TPU v4": 9.0e10,
    "TPU v5 lite": 9.0e10,
    "TPU v5e": 9.0e10,
    "TPU v5p": 1.8e11,
    "TPU v6 lite": 1.8e11,
    "TPU v6e": 1.8e11,
}


def comm_model(grad_bytes: int, step_s_1dev: float, rays_per_step: int,
               device_kind: str, n_list, accum_list) -> dict:
    """Analytic dp-efficiency prediction for a real slice.

    Per optimizer step each device ring-all-reduces the full gradient
    pytree: bytes_on_wire/device = 2 * grad_bytes * (n-1)/n. With the
    measured single-chip step time T1(rays), assuming compute scales
    linearly in rays/device and the all-reduce is NOT overlapped (worst
    case; XLA overlaps some of it):

      strong:  T_comp(n) = T1 * (rays/n)/rays ;  eff = T_comp/(T_comp+T_comm)
      weak:    T_comp(n) = T1                  ;  same formula
      accum k: k fwd/bwd per all-reduce        ;  T_comm amortized k-fold
    """
    bw = next(
        (v for k, v in ICI_BW_BIDI.items() if k.lower() in device_kind.lower()),
        9.0e10,
    )
    out = {
        "grad_bytes_per_step": grad_bytes,
        "assumed_ici_bw_bidi_bytes_per_s": bw,
        "device_kind": device_kind,
        "measured_step_s_1dev": step_s_1dev,
        "rays_per_step": rays_per_step,
        "note": (
            "all-reduce modeled UNoverlapped (worst case); halve T_comm for "
            "a fully-overlapped bound. eff = T_comp/(T_comp+T_comm)."
        ),
    }
    for regime in ("strong", "weak"):
        rows = []
        for n in n_list:
            t_comm = 2.0 * grad_bytes * (n - 1) / n / bw
            for k in accum_list:
                # accum k amortizes ONE all-reduce over k fwd/bwd passes
                t_comp = step_s_1dev * k * (1.0 if regime == "weak" else 1.0 / n)
                eff = t_comp / (t_comp + t_comm) if n > 1 else 1.0
                rows.append({
                    "n": n, "accum": k,
                    "t_comp_ms": round(t_comp * 1e3, 3),
                    "t_allreduce_ms": round(t_comm * 1e3, 3),
                    "efficiency": round(eff, 3),
                })
        out[regime] = rows
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--pixels", default="1000,5000")
    ap.add_argument("--mode", default="strong", choices=["strong", "weak"],
                    help="strong: --pixels is the global batch; weak: "
                    "--pixels is rays PER DEVICE")
    ap.add_argument("--accum", default="1",
                    help="comma list of gradient-accumulation factors k, "
                    "passed to the production mapping_stage(accum=k) knob "
                    "(parallel.accum): k-fold rays per Adam step / "
                    "all-reduce, 1/k steps (same total rays)")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument("--step-s-1dev", type=float, default=None,
                    help="measured single-REAL-chip step seconds at the "
                    "1000-ray workload for the comm model (default: read "
                    "BENCH median cycle / 110 iters if BENCH_r*.json exists)")
    ap.add_argument("--device-kind", default="TPU v5e",
                    help="device kind for the comm model's ICI bandwidth")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "native"],
                    help="cpu = virtual-device plumbing run; native = run on "
                    "the real default backend (use on a real multi-chip slice)")
    ap.add_argument("--quick", action="store_true", help="tiny smoke mode")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--n", type=int, default=1, help=argparse.SUPPRESS)
    ap.add_argument("--px", type=int, default=1000, help=argparse.SUPPRESS)
    ap.add_argument("--accum-k", type=int, default=1, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.quick:
        args.devices, args.pixels, args.iters, args.reps = "1,2", "320", 2, 1

    if args.child:
        rec = child_measure(args.n, args.px, args.iters, args.reps,
                            args.platform, args.accum_k)
        print("CHILD_RESULT " + json.dumps(rec))
        return

    device_list = [int(x) for x in args.devices.split(",")]
    pixel_list = [int(x) for x in args.pixels.split(",")]
    accum_list = [int(x) for x in args.accum.split(",")]

    results = []
    for px in pixel_list:
        for n in device_list:
            for k in accum_list:
                global_px = px * (n if args.mode == "weak" else 1)
                env = dict(os.environ)
                if args.platform == "cpu":
                    env["JAX_PLATFORMS"] = "cpu"
                    env["XLA_FLAGS"] = (
                        env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n}"
                    ).strip()
                iters = max(2, args.iters // k)
                cmd = [
                    sys.executable, os.path.abspath(__file__), "--child",
                    "--n", str(n), "--px", str(global_px),
                    "--iters", str(iters), "--accum-k", str(k),
                    "--reps", str(args.reps), "--platform", args.platform,
                ]
                print(f"[bench_scaling] mode={args.mode} n={n} px/dev="
                      f"{global_px // n} accum={k} ...", flush=True)
                out = subprocess.run(
                    cmd, env=env, capture_output=True, text=True, timeout=1800
                )
                line = [l for l in out.stdout.splitlines()
                        if l.startswith("CHILD_RESULT ")]
                if not line:
                    print(out.stdout[-2000:], file=sys.stderr)
                    print(out.stderr[-2000:], file=sys.stderr)
                    raise RuntimeError(f"child n={n} px={px} failed")
                rec = json.loads(line[-1][len("CHILD_RESULT "):])
                rec["mode"] = args.mode
                rec["accum"] = k
                rec["base_pixels"] = px
                print(f"    -> {rec['rays_per_s']:.0f} rays/s "
                      f"(compile {rec['compile_s']:.0f}s)", flush=True)
                results.append(rec)

    # efficiency per workload (both modes: ideal rays/s is linear in n)
    workloads = {}
    for px in pixel_list:
        for k in accum_list:
            series = sorted(
                [r for r in results
                 if r["base_pixels"] == px and r["accum"] == k],
                key=lambda r: r["n_devices"],
            )
            if not series:
                continue
            base = series[0]
            tag = f"{px}px" + (f"_accum{k}" if k != 1 else "")
            workloads[tag] = {
                "mode": args.mode,
                "n_devices": [r["n_devices"] for r in series],
                "rays_per_s": [round(r["rays_per_s"], 1) for r in series],
                "efficiency_vs_linear": [
                    round(
                        r["rays_per_s"]
                        / (base["rays_per_s"] * r["n_devices"] / base["n_devices"]),
                        3,
                    )
                    for r in series
                ],
            }

    # analytic real-slice prediction from measured single-chip step time
    step_s = args.step_s_1dev
    if step_s is None:
        # checked-in TPU profile if available, else BENCH cycle/110
        try:
            with open("PROFILE_r03.json") as f:
                prof = json.load(f)
            step_s = prof.get(
                "full_iter_color_rows", prof["full_iter_color"]
            ) / 1e3
        except Exception:
            try:
                import glob

                bench = sorted(glob.glob("BENCH_r*.json"))[-1]
                with open(bench) as f:
                    step_s = json.load(f)["cycle_s_median"] / 110.0
            except Exception:
                step_s = 0.020  # documented fallback guess
    model = comm_model(
        results[0]["grad_bytes_per_step"], step_s, pixel_list[0],
        args.device_kind, device_list, accum_list if accum_list != [1] else [1, 5, 15],
    )

    payload = {
        "harness": "bench_scaling.py",
        "metric": "mapping rays/s vs device count (production mapping_stage, "
                  f"ray-sharded dp, {args.mode} scaling)",
        "platform": (
            "cpu-virtual" if args.platform == "cpu" else results[0]["backend"]
        ),
        "caveat": (
            "virtual CPU devices share 2 physical host cores on this machine: "
            "this run validates the sharded-execution plumbing and measures "
            "partition/collective overhead, NOT hardware scaling. Run with "
            "--platform native on a real multi-chip slice for true efficiency. "
            "The comm_model section is the hardware prediction."
            if args.platform == "cpu" else
            "measured on real devices"
        ),
        "workloads": workloads,
        "comm_model": model,
        "raw": results,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"scaling": {k: v["efficiency_vs_linear"]
                                  for k, v in workloads.items()},
                      "out": args.out}))


if __name__ == "__main__":
    main()
