#!/usr/bin/env python
"""Scaling-efficiency harness: mapping rays/s vs device count (north star:
>=80% rays/s efficiency from 1 chip to N>=2).

Measures the PRODUCTION data-parallel mapping stage (slam/mapper.py
``mapping_stage`` — scanned multi-iteration loop, ray batch sharded over a
1-D dp mesh, replicated scene params, XLA-inserted gradient all-reduce) at
n in {1, 2, 4, 8} devices for the two reference workload shapes:

  - Replica: 1000 rays/iter (configs/df_prior.yaml:62-64)
  - ScanNet: 5000 rays/iter (configs/ScanNet/scannet.yaml:20-23)

Efficiency(n) = rays_per_s(n) / (n * rays_per_s(1))  [strong scaling: the
global ray batch is fixed, so per-device work shrinks with n].

Each device count runs in a fresh subprocess with
``--xla_force_host_platform_device_count=n`` so the mesh plumbing
(sharding constraints, collectives, multi-executable dispatch) is exercised
exactly as on a real pod slice.

IMPORTANT CAVEAT (recorded in the output JSON): this machine exposes ONE
real TPU chip and only 2 host cores. Virtual CPU "devices" share those
cores, so CPU-mesh wall-clock CANNOT show real speedup — the CPU series
validates the plumbing and measures collective/partition overhead, not
hardware scaling. Real efficiency numbers require a real multi-chip slice;
this harness is the measurement tool for that day (run it there unchanged
with --platform native). The single-real-chip absolute rays/s is bench.py's
job (BENCH_r*.json).

Usage:
    python bench_scaling.py [--devices 1,2,4,8] [--pixels 1000,5000]
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
                  platform: str) -> dict:
    """Measure rays/s of the production mapping stage on an n-device mesh."""
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
    pixs_per_image = pixels // F

    def one_stage(params):
        astate = adam_init(params)
        keys = jax.random.split(jax.random.PRNGKey(2), n_iters)
        wf = jnp.zeros((n_iters,), jnp.float32)
        return mapping_stage(
            params, astate, frames_color, frames_depth, frames_c2w,
            None, tsdf, tsdf_bnds, jbound, keys, wf, lrs, "color",
            pixs_per_image, cam, rcfg, (False, False), 0.2, False, rsh,
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

    rays = pixs_per_image * F * n_iters * reps
    return {
        "n_devices": n_devices,
        "pixels": pixels,
        "rays_per_s": rays / elapsed,
        "compile_s": compile_s,
        "elapsed_s": elapsed,
        "backend": jax.default_backend(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--pixels", default="1000,5000")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "native"],
                    help="cpu = virtual-device plumbing run; native = run on "
                    "the real default backend (use on a real multi-chip slice)")
    ap.add_argument("--quick", action="store_true", help="tiny smoke mode")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--n", type=int, default=1, help=argparse.SUPPRESS)
    ap.add_argument("--px", type=int, default=1000, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.quick:
        args.devices, args.pixels, args.iters, args.reps = "1,2", "320", 2, 1

    if args.child:
        rec = child_measure(args.n, args.px, args.iters, args.reps, args.platform)
        print("CHILD_RESULT " + json.dumps(rec))
        return

    device_list = [int(x) for x in args.devices.split(",")]
    pixel_list = [int(x) for x in args.pixels.split(",")]

    results = []
    for px in pixel_list:
        for n in device_list:
            env = dict(os.environ)
            if args.platform == "cpu":
                env["JAX_PLATFORMS"] = "cpu"
                env["XLA_FLAGS"] = (
                    env.get("XLA_FLAGS", "")
                    + f" --xla_force_host_platform_device_count={n}"
                ).strip()
            cmd = [
                sys.executable, os.path.abspath(__file__), "--child",
                "--n", str(n), "--px", str(px), "--iters", str(args.iters),
                "--reps", str(args.reps), "--platform", args.platform,
            ]
            print(f"[bench_scaling] n={n} pixels={px} ...", flush=True)
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
            print(f"    -> {rec['rays_per_s']:.0f} rays/s "
                  f"(compile {rec['compile_s']:.0f}s)", flush=True)
            results.append(rec)

    # strong-scaling efficiency per workload
    workloads = {}
    for px in pixel_list:
        series = sorted(
            [r for r in results if r["pixels"] == px],
            key=lambda r: r["n_devices"],
        )
        base = next(r for r in series if r["n_devices"] == min(device_list))
        workloads[f"{px}px"] = {
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

    payload = {
        "harness": "bench_scaling.py",
        "metric": "mapping rays/s vs device count (production mapping_stage, "
                  "ray-sharded dp, strong scaling)",
        "platform": (
            "cpu-virtual" if args.platform == "cpu" else results[0]["backend"]
        ),
        "caveat": (
            "virtual CPU devices share 2 physical host cores on this machine: "
            "this run validates the sharded-execution plumbing and measures "
            "partition/collective overhead, NOT hardware scaling. Run with "
            "--platform native on a real multi-chip slice for true efficiency."
            if args.platform == "cpu" else
            "measured on real devices"
        ),
        "workloads": workloads,
        "raw": results,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"scaling": {k: v["efficiency_vs_linear"]
                                  for k, v in workloads.items()},
                      "out": args.out}))


if __name__ == "__main__":
    main()
