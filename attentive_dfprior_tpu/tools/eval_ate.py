"""Absolute Trajectory Error evaluation (TUM protocol).

Equivalent of the reference's src/tools/eval_ate.py: associate timestamps,
Horn closed-form SE(3) alignment, translational RMSE/mean/median/min/max,
optional trajectory plot. Loads the last checkpoint of a run
(ref: eval_ate.py:259-301).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Tuple

import numpy as np


def associate(
    first_stamps: List[float],
    second_stamps: List[float],
    offset: float = 0.0,
    max_difference: float = 0.02,
) -> List[Tuple[float, float]]:
    """Greedy best-first timestamp association (ref: eval_ate.py:11-41)."""
    potential = [
        (abs(a - (b + offset)), a, b)
        for a in first_stamps
        for b in second_stamps
        if abs(a - (b + offset)) < max_difference
    ]
    potential.sort()
    first_used, second_used, matches = set(), set(), []
    for diff, a, b in potential:
        if a not in first_used and b not in second_used:
            first_used.add(a)
            second_used.add(b)
            matches.append((a, b))
    matches.sort()
    return matches


def align(model: np.ndarray, data: np.ndarray):
    """Horn's closed-form alignment of two (3, N) trajectories
    (ref: eval_ate.py:44-78).

    Returns:
        rot (3,3), trans (3,1), trans_error (N,)
    """
    model_zero = model - model.mean(1, keepdims=True)
    data_zero = data - data.mean(1, keepdims=True)
    W = model_zero @ data_zero.T
    U, d, Vh = np.linalg.svd(W.T)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vh) < 0:
        S[2, 2] = -1
    rot = U @ S @ Vh
    trans = data.mean(1, keepdims=True) - rot @ model.mean(1, keepdims=True)
    model_aligned = rot @ model + trans
    err = model_aligned - data
    trans_error = np.sqrt((err * err).sum(0))
    return rot, trans, trans_error


def evaluate_ate(
    first_poses: Dict[float, np.ndarray],
    second_poses: Dict[float, np.ndarray],
    offset: float = 0.0,
    max_difference: float = 0.02,
    scale: float = 1.0,
    plot_path: str | None = None,
) -> Dict[str, float]:
    """ATE metrics between two {stamp: 4x4 c2w} trajectories
    (ref: eval_ate.py:113-223)."""
    matches = associate(
        list(first_poses.keys()), list(second_poses.keys()), offset, max_difference
    )
    if len(matches) < 2:
        raise ValueError("not enough matching trajectory pairs")
    first_xyz = np.array([first_poses[a][:3, 3] for a, _ in matches]).T
    second_xyz = np.array(
        [second_poses[b][:3, 3] * scale for _, b in matches]
    ).T
    rot, trans, trans_error = align(first_xyz, second_xyz)

    if plot_path:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        aligned = rot @ first_xyz + trans
        fig, ax = plt.subplots()
        ax.plot(second_xyz[0], second_xyz[1], "-", color="black", label="ground truth")
        ax.plot(aligned[0], aligned[1], "-", color="blue", label="estimated")
        ax.legend()
        ax.set_xlabel("x [m]")
        ax.set_ylabel("y [m]")
        plt.savefig(plot_path, dpi=90)
        plt.close(fig)

    return {
        "compared_pose_pairs": len(matches),
        "absolute_translational_error.rmse": float(
            np.sqrt(np.dot(trans_error, trans_error) / len(trans_error))
        ),
        "absolute_translational_error.mean": float(np.mean(trans_error)),
        "absolute_translational_error.median": float(np.median(trans_error)),
        "absolute_translational_error.std": float(np.std(trans_error)),
        "absolute_translational_error.min": float(np.min(trans_error)),
        "absolute_translational_error.max": float(np.max(trans_error)),
    }


def convert_poses(c2w_list: np.ndarray, scale: float = 1.0) -> Dict[float, np.ndarray]:
    """Pose array -> {stamp: pose}, masking non-finite entries
    (ref: eval_ate.py:239-256)."""
    poses = {}
    for i in range(len(c2w_list)):
        c2w = np.array(c2w_list[i], dtype=np.float64)
        if not np.isfinite(c2w).all():
            continue
        if np.allclose(c2w, 0):
            continue
        c2w[:3, 3] *= scale
        poses[float(i)] = c2w
    return poses


def evaluate_checkpoint(ckpt_path: str, plot_path: str | None = None) -> Dict[str, float]:
    """Evaluate ATE from a framework checkpoint (.npz)."""
    data = np.load(ckpt_path)
    gt = convert_poses(data["gt_c2w_list"])
    est = convert_poses(data["estimate_c2w_list"])
    common = sorted(set(gt) & set(est))
    gt = {k: gt[k] for k in common}
    est = {k: est[k] for k in common}
    result = evaluate_ate(gt, est, plot_path=plot_path)
    result["absolute_translational_error.rmse_cm"] = (
        result["absolute_translational_error.rmse"] * 100.0
    )
    return result


def main():
    parser = argparse.ArgumentParser(description="ATE evaluation")
    parser.add_argument("config", nargs="?", help="scene config (to locate output dir)")
    parser.add_argument("--output", help="run output folder")
    parser.add_argument("--ckpt", help="explicit checkpoint path")
    args = parser.parse_args()

    ckpt = args.ckpt
    if ckpt is None:
        from attentive_dfprior_tpu.config import default_config_path, load_config
        from attentive_dfprior_tpu.utils.logger import latest_checkpoint

        cfg = load_config(args.config, default_config_path())
        output = args.output or cfg["data"]["output"]
        ckpt = latest_checkpoint(os.path.join(output, "ckpts"))
        if ckpt is None:
            raise SystemExit(f"no checkpoint found under {output}/ckpts")

    plot = os.path.join(os.path.dirname(os.path.dirname(ckpt)), "ate_plot.png")
    result = evaluate_checkpoint(ckpt, plot_path=plot)
    for k, v in result.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
