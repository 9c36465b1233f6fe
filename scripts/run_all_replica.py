#!/usr/bin/env python
"""Batch runner: all 8 Replica scenes (BASELINE.json configs[4]).

Runs get_tsdf + SLAM + ATE + recon eval per scene sequentially on this host.
For a multi-host pod, launch one scene per host; enable intra-host ray-batch
data parallelism with ``parallel: {enable: true}`` in the config (see
attentive_dfprior_tpu/parallel/sharding.py).
"""
import argparse
import os
import subprocess
import sys

SCENES = ["room0", "room1", "room2", "office0", "office1", "office2", "office3", "office4"]

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="*", default=SCENES)
    ap.add_argument("--skip_tsdf", action="store_true")
    args = ap.parse_args()
    for scene in args.scenes:
        cfgp = f"configs/Replica/{scene}.yaml"
        if not args.skip_tsdf:
            subprocess.run([sys.executable, "get_tsdf.py", cfgp, "--space", "1"], check=True)
        subprocess.run([sys.executable, "run.py", cfgp], check=True)
        subprocess.run(
            [sys.executable, "-m", "attentive_dfprior_tpu.tools.eval_ate", cfgp],
            check=True,
        )

if __name__ == "__main__":
    main()
