#!/usr/bin/env python
"""Run full SLAM on a scene config (ref: run.py:11-33).

Usage:
    python run.py configs/Replica/room0.yaml [--input_folder F] [--output O]
                  [--resume] [--seed N] [--end_idx N]
"""

import argparse
import os
import random

import numpy as np


def setup_seed(seed: int) -> None:
    """Deterministic seeding (ref: run.py:11-16; unlike the reference, we
    actually call it)."""
    np.random.seed(seed)
    random.seed(seed)


def main():
    parser = argparse.ArgumentParser(description="Arguments for running the code.")
    parser.add_argument("config", type=str, help="Path to config file.")
    parser.add_argument("--input_folder", type=str, help="overrides config input path")
    parser.add_argument("--output", type=str, help="overrides config output path")
    parser.add_argument("--resume", action="store_true", help="resume from the latest checkpoint")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--end_idx", type=int, default=None, help="stop after this frame (debug)")
    parser.add_argument(
        "--multihost",
        action="store_true",
        help="initialize jax.distributed for a multi-host TPU slice "
        "(coordinator/process env per JAX conventions, or explicit "
        "DFPRIOR_COORD / DFPRIOR_NPROCS / DFPRIOR_PROC_ID env vars for "
        "manual clusters); equivalent to parallel.multihost: True in the "
        "config",
    )
    parser.add_argument(
        "--init_only",
        action="store_true",
        help="initialize the runtime (incl. --multihost jax.distributed) "
        "and exit — cluster bring-up sanity check",
    )
    args = parser.parse_args()

    setup_seed(args.seed)

    from attentive_dfprior_tpu.config import default_config_path, load_config
    from attentive_dfprior_tpu.slam.system import SLAMSystem
    from attentive_dfprior_tpu.utils.cache import enable_compilation_cache
    from attentive_dfprior_tpu.utils.logger import latest_checkpoint

    cfg = load_config(args.config, default_config_path())
    cfg["seed"] = args.seed
    # Persistent XLA compilation cache: ScanNet-scale step graphs compile in
    # ~46 s cold (BENCH_r04 scannet.compile_s); a warm restart skips that.
    # Config knob `compile_cache_dir` overrides the default ~/.cache path
    # (DFPRIOR_COMPILE_CACHE=0 disables, DFPRIOR_COMPILE_CACHE_DIR also works).
    enable_compilation_cache(cfg.get("compile_cache_dir"))

    # Multi-host entry: each host runs this same script; jax.distributed
    # wires the hosts into one slice-wide runtime (coordinator address etc.
    # come from the TPU metadata / JAX_COORDINATOR_ADDRESS env). Must run
    # BEFORE any other jax API touches the backend.
    if args.multihost or bool(cfg.get("parallel", {}).get("multihost", False)):
        import jax

        # Manual-cluster override (CPU smoke / non-TPU-metadata clusters):
        # DFPRIOR_COORD=host:port DFPRIOR_NPROCS=N DFPRIOR_PROC_ID=i.
        # Exercised by scripts/multihost_smoke.py + tests/test_multihost.py.
        kw = {}
        if os.environ.get("DFPRIOR_COORD"):
            kw = dict(
                coordinator_address=os.environ["DFPRIOR_COORD"],
                num_processes=int(os.environ["DFPRIOR_NPROCS"]),
                process_id=int(os.environ["DFPRIOR_PROC_ID"]),
            )
            if os.environ.get("DFPRIOR_FORCE_CPU"):
                jax.config.update("jax_platforms", "cpu")
        jax.distributed.initialize(**kw)
        print(
            f"multihost: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices",
            flush=True,
        )
    if args.init_only:
        return
    slam = SLAMSystem(cfg, args)

    start = 0
    if args.resume:
        ckpt = latest_checkpoint(os.path.join(slam.output, "ckpts"))
        if ckpt:
            start = slam.resume(ckpt)
            print(f"Resumed from {ckpt}; continuing at frame {start}")
    slam.run(start_idx=start, end_idx=args.end_idx)


if __name__ == "__main__":
    main()
