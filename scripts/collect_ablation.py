#!/usr/bin/env python
"""Merge ablation wave JSONs into the checked-in ABLATE_TRACKING artifact.

Usage:
    python scripts/collect_ablation.py ABLATE_TRACKING_r04.json \
        /tmp/ablate_tracking.json /tmp/ablate_w2.json [...]

Each input is a {variant: record} dict from scripts/ablate_tracking.py;
records with a "seed" field other than 0 are grouped under
"seed_reruns". The output adds a ranked summary table.
"""

import json
import sys
import time


def main():
    out_path = sys.argv[1]
    runs = {}
    seed_reruns = {}
    for path in sys.argv[2:]:
        with open(path) as f:
            d = json.load(f)
        for name, rec in d.items():
            seed = rec.get("seed", 0)
            if seed == 0:
                runs[name] = rec
            else:
                seed_reruns.setdefault(name, {})[f"seed{seed}"] = rec
    ranked = sorted(runs.items(), key=lambda kv: kv[1]["ate_cm_aligned"])
    payload = {
        "protocol": (
            "configs/Synthetic/room_tracking.yaml, full 120-frame SLAM run "
            "per variant on the real TPU chip, trajectory-only (side "
            "outputs disabled), aligned ATE via tools.eval_ate.evaluate_ate "
            "(the reference eval contract, ref: src/tools/eval_ate.py:113-223)"
        ),
        "ranked": [
            {"variant": k, "ate_cm": v["ate_cm_aligned"],
             "overrides": v["overrides"]}
            for k, v in ranked
        ],
        "runs": runs,
        "seed_reruns": seed_reruns,
        "when": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out_path}: {len(runs)} variants, "
          f"{sum(len(v) for v in seed_reruns.values())} seed reruns")
    for k, v in ranked[:8]:
        print(f"  {k:26s} {v['ate_cm_aligned']:7.2f} cm")


if __name__ == "__main__":
    main()
