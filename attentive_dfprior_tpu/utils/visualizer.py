"""Visualization: rendered-vs-GT depth/color panels saved per iteration.

Equivalent of the reference Visualizer (ref: src/utils/Visualizer.py:8-123):
renders the full frame at the current pose and writes a 2x3 matplotlib panel
of input/generated/residual depth and RGB.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np

from attentive_dfprior_tpu.ops.pose import homogenize, pose_matrix_from_tensor


class Visualizer:
    def __init__(
        self, freq: int, inside_freq: int, vis_dir: str, renderer, verbose: bool = False
    ):
        self.freq = freq
        self.inside_freq = inside_freq
        self.vis_dir = vis_dir
        self.renderer = renderer
        self.verbose = verbose
        os.makedirs(vis_dir, exist_ok=True)

    def vis(
        self,
        idx: int,
        it: int,
        gt_depth: np.ndarray,
        gt_color: np.ndarray,
        c2w_or_camera_tensor,
        params: Any,
        tsdf_volume,
    ) -> Optional[str]:
        """Save a comparison panel if the (idx, it) gate fires."""
        if idx % self.freq != 0 or it % self.inside_freq != 0:
            return None
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        c2w = np.asarray(c2w_or_camera_tensor)
        if c2w.ndim == 1:
            c2w = np.asarray(
                homogenize(pose_matrix_from_tensor(c2w_or_camera_tensor))
            )

        depth, _, color = self.renderer.render_img(
            params, c2w, tsdf_volume, stage="color", gt_depth=gt_depth
        )
        depth_np = np.asarray(depth)
        color_np = np.asarray(color)
        gt_depth_np = np.asarray(gt_depth)
        gt_color_np = np.asarray(gt_color)

        depth_res = np.abs(gt_depth_np - depth_np)
        depth_res[gt_depth_np == 0.0] = 0.0
        color_res = np.abs(gt_color_np - color_np)
        color_res[gt_depth_np == 0.0] = 0.0

        fig, axs = plt.subplots(2, 3)
        fig.tight_layout()
        max_depth = float(np.max(gt_depth_np)) or 1.0
        panels = [
            (gt_depth_np, "Input Depth", dict(cmap="plasma", vmin=0, vmax=max_depth)),
            (depth_np, "Generated Depth", dict(cmap="plasma", vmin=0, vmax=max_depth)),
            (depth_res, "Depth Residual", dict(cmap="plasma", vmin=0, vmax=max_depth)),
            (np.clip(gt_color_np, 0, 1), "Input RGB", {}),
            (np.clip(color_np, 0, 1), "Generated RGB", {}),
            (np.clip(color_res, 0, 1), "RGB Residual", {}),
        ]
        for ax, (img, title, kw) in zip(axs.ravel(), panels):
            ax.imshow(img, **kw)
            ax.set_title(title)
            ax.set_xticks([])
            ax.set_yticks([])
        plt.subplots_adjust(wspace=0, hspace=0)
        out = f"{self.vis_dir}/{idx:05d}_{it:04d}.jpg"
        plt.savefig(out, bbox_inches="tight", pad_inches=0.2)
        plt.close(fig)
        if self.verbose:
            print(f"Saved rendering visualization at {out}")
        return out
