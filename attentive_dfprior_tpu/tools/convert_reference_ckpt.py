"""Convert a reference (torch) DF-Prior checkpoint into this framework's
scene-parameter layout.

The reference Logger saves ``{'c': grids[1,C,Z,Y,X], 'decoder_state_dict':
..., 'estimate_c2w_list': ..., ...}`` as a torch .tar
(ref: src/utils/Logger.py:22-37). This tool remaps:
  - grids: [1, C, NZ, NY, NX] -> channels-last (NX, NY, NZ, C)
  - decoder weights: torch (out, in) Linear layout -> (in, out)
  - trajectories / keyframe metadata -> our .npz checkpoint schema

so a user of the reference can resume or evaluate their runs here.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict

import numpy as np


def convert_grid(t) -> np.ndarray:
    """[1, C, NZ, NY, NX] torch tensor -> (NX, NY, NZ, C) numpy."""
    a = t.detach().cpu().numpy()[0]  # (C, NZ, NY, NX)
    return np.transpose(a, (3, 2, 1, 0)).copy()


def convert_mlp_decoder(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    n_blocks = 5
    out = {
        "B": sd[f"{prefix}.embedder._B"].detach().cpu().numpy(),
        "pts": [], "fc_c": [],
    }
    for i in range(n_blocks):
        out["pts"].append(
            {
                "w": sd[f"{prefix}.pts_linears.{i}.weight"].detach().cpu().numpy().T,
                "b": sd[f"{prefix}.pts_linears.{i}.bias"].detach().cpu().numpy(),
            }
        )
        out["fc_c"].append(
            {
                "w": sd[f"{prefix}.fc_c.{i}.weight"].detach().cpu().numpy().T,
                "b": sd[f"{prefix}.fc_c.{i}.bias"].detach().cpu().numpy(),
            }
        )
    out["out"] = {
        "w": sd[f"{prefix}.output_linear.weight"].detach().cpu().numpy().T,
        "b": sd[f"{prefix}.output_linear.bias"].detach().cpu().numpy(),
    }
    return out


def convert_mlp_tsdf(sd: Dict[str, Any]) -> Dict[str, Any]:
    out = {"layers": []}
    for i in range(4):
        out["layers"].append(
            {
                "w": sd[f"mlp.pts_linears.{i}.weight"].detach().cpu().numpy().T,
                "b": sd[f"mlp.pts_linears.{i}.bias"].detach().cpu().numpy(),
            }
        )
    out["out"] = {
        "w": sd["mlp.output_linear.weight"].detach().cpu().numpy().T,
        "b": sd["mlp.output_linear.bias"].detach().cpu().numpy(),
    }
    return out


def convert(ckpt_path: str) -> Dict[str, Any]:
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu")
    sd = ckpt["decoder_state_dict"]
    params = {
        "grid_low": convert_grid(ckpt["c"]["grid_low"]),
        "grid_high": convert_grid(ckpt["c"]["grid_high"]),
        "grid_color": convert_grid(ckpt["c"]["grid_color"]),
        "low": convert_mlp_decoder(sd, "low_decoder"),
        "high": convert_mlp_decoder(sd, "high_decoder"),
        "color": convert_mlp_decoder(sd, "color_decoder"),
        "mlp": convert_mlp_tsdf(sd),
    }
    meta = {
        "idx": int(ckpt["idx"]),
        "estimate_c2w_list": ckpt["estimate_c2w_list"].cpu().numpy(),
        "gt_c2w_list": ckpt["gt_c2w_list"].cpu().numpy(),
        "keyframe_idx_list": np.asarray(ckpt.get("keyframe_list", []), np.int64),
    }
    return {"params": params, "meta": meta}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("torch_ckpt", help="reference ckpts/xxxxx.tar")
    ap.add_argument("out_npz", help="output .npz in our checkpoint schema")
    args = ap.parse_args()

    import jax

    data = convert(args.torch_ckpt)
    params, meta = data["params"], data["meta"]

    from attentive_dfprior_tpu.utils.logger import _flatten_pytree

    payload = _flatten_pytree(params)
    kf = meta["keyframe_idx_list"]
    payload.update(
        idx=np.asarray(meta["idx"]),
        estimate_c2w_list=meta["estimate_c2w_list"],
        gt_c2w_list=meta["gt_c2w_list"],
        keyframe_idx_list=kf,
        keyframe_est_c2w=np.stack(
            [meta["estimate_c2w_list"][i] for i in kf], axis=0
        ) if len(kf) else np.zeros((0, 4, 4), np.float32),
    )
    np.savez_compressed(args.out_npz, **payload)
    print(f"converted {args.torch_ckpt} -> {args.out_npz}")


if __name__ == "__main__":
    main()
