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
        keyframe_gt_c2w: Optional[np.ndarray] = None,
        selected_keyframes: Optional[Dict[int, Any]] = None,
    ) -> str:
        """Write a checkpoint.

        Matches the reference Logger's payload (ref: src/utils/Logger.py:24-34:
        grids, decoders, gt/est pose lists, keyframe list, selected
        keyframes, idx) so eval paths never need the dataset to reconstruct
        state. ``selected_keyframes`` ({mapped idx: [est_c2w, ...]}) is
        ragged and stored as a flat array + offsets.
        """
        path = os.path.join(self.ckptsdir, f"{idx:05d}.npz")
        payload = _flatten_pytree(params)
        payload.update(
            idx=np.asarray(idx),
            estimate_c2w_list=np.asarray(estimate_c2w_list),
            gt_c2w_list=np.asarray(gt_c2w_list),
            keyframe_idx_list=np.asarray(keyframe_idx_list, dtype=np.int64),
            keyframe_est_c2w=np.asarray(keyframe_est_c2w),
        )
        if keyframe_gt_c2w is not None:
            payload["keyframe_gt_c2w"] = np.asarray(keyframe_gt_c2w)
        if selected_keyframes:
            sel_idx = np.asarray(sorted(selected_keyframes), dtype=np.int64)
            counts = [len(selected_keyframes[int(i)]) for i in sel_idx]
            offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
            poses = [
                np.asarray(entry["est_c2w"], dtype=np.float32)
                for i in sel_idx
                for entry in selected_keyframes[int(i)]
            ]
            payload["selected_kf_idx"] = sel_idx
            payload["selected_kf_offsets"] = offsets
            payload["selected_kf_est_c2w"] = (
                np.stack(poses) if poses else np.zeros((0, 4, 4), np.float32)
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
    if "keyframe_gt_c2w" in data:
        meta["keyframe_gt_c2w"] = data["keyframe_gt_c2w"]
    if "selected_kf_idx" in data:
        sel: Dict[int, list] = {}
        offsets = data["selected_kf_offsets"]
        poses = data["selected_kf_est_c2w"]
        for j, i in enumerate(data["selected_kf_idx"]):
            sel[int(i)] = [
                {"est_c2w": poses[k]} for k in range(offsets[j], offsets[j + 1])
            ]
        meta["selected_keyframes"] = sel
    return params, meta
