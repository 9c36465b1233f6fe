#!/usr/bin/env python
"""Build the TSDF prior volume for a scene (ref: get_tsdf.py:101-143).

Usage:
    python get_tsdf.py configs/Replica/room0.yaml [--space N]
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description="Arguments for running the code.")
    parser.add_argument("config", type=str, help="Path to config file.")
    parser.add_argument("--input_folder", type=str)
    parser.add_argument("--output", type=str)
    parser.add_argument(
        "--space",
        type=int,
        default=None,
        help="integrate every space-th frame into the TSDF volume "
        "(default: the config's tsdf.space, else 10; the reference uses "
        "1 for Replica and 10 for ScanNet)",
    )
    args = parser.parse_args()

    from attentive_dfprior_tpu.config import default_config_path, load_config
    from attentive_dfprior_tpu.tsdf.builder import save_tsdf_volume
    from attentive_dfprior_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = load_config(args.config, default_config_path())
    space = args.space
    if space is None:
        space = int(cfg.get("tsdf", {}).get("space", 10))
    out = save_tsdf_volume(cfg, args, space=space)
    print(f"Saved TSDF volume to {out}")


if __name__ == "__main__":
    main()
