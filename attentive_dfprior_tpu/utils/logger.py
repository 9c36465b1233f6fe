"""Checkpointing: save AND resume (the reference only saves).

The reference Logger torch.saves grids/decoders/poses every ckpt_freq frames
(ref: src/utils/Logger.py:22-37) but has no resume path
(SURVEY §5). Here checkpoints are flat .npz archives of the scene pytree +
trajectory + keyframe metadata, and ``load_checkpoint`` restores a run
mid-stream.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_pytree(params: Any, prefix: str = "p") -> Dict[str, np.ndarray]:
    flat, treedef = jax.tree_util.tree_flatten(params)
    out = {f"{prefix}{i:04d}": np.asarray(x) for i, x in enumerate(flat)}
    return out


def _unflatten_like(template: Any, data: Dict[str, np.ndarray], prefix: str = "p") -> Any:
    flat, treedef = jax.tree_util.tree_flatten(template)
    leaves = [jnp.asarray(data[f"{prefix}{i:04d}"]) for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


class Logger:
    """Periodic checkpoint writer (ref: src/utils/Logger.py)."""

    def __init__(self, ckptsdir: str, verbose: bool = True):
        self.ckptsdir = ckptsdir
        self.verbose = verbose
        os.makedirs(ckptsdir, exist_ok=True)

    def log(
        self,
        idx: int,
        params: Any,
        estimate_c2w_list: np.ndarray,
        gt_c2w_list: np.ndarray,
        keyframe_idx_list,
        keyframe_est_c2w: np.ndarray,
    ) -> str:
        path = os.path.join(self.ckptsdir, f"{idx:05d}.npz")
        payload = _flatten_pytree(params)
        payload.update(
            idx=np.asarray(idx),
            estimate_c2w_list=np.asarray(estimate_c2w_list),
            gt_c2w_list=np.asarray(gt_c2w_list),
            keyframe_idx_list=np.asarray(keyframe_idx_list, dtype=np.int64),
            keyframe_est_c2w=np.asarray(keyframe_est_c2w),
        )
        np.savez_compressed(path, **payload)
        if self.verbose:
            print("Saved checkpoint at", path)
        return path


def latest_checkpoint(ckptsdir: str) -> Optional[str]:
    if not os.path.isdir(ckptsdir):
        return None
    cands = sorted(f for f in os.listdir(ckptsdir) if f.endswith(".npz"))
    return os.path.join(ckptsdir, cands[-1]) if cands else None


def load_checkpoint(
    path: str, params_template: Any
) -> Tuple[Any, Dict[str, np.ndarray]]:
    """Restore (params, metadata) from a checkpoint written by Logger.log."""
    data = dict(np.load(path, allow_pickle=False))
    params = _unflatten_like(params_template, data)
    meta = {
        "idx": int(data["idx"]),
        "estimate_c2w_list": data["estimate_c2w_list"],
        "gt_c2w_list": data["gt_c2w_list"],
        "keyframe_idx_list": data["keyframe_idx_list"],
        "keyframe_est_c2w": data["keyframe_est_c2w"],
    }
    return params, meta
