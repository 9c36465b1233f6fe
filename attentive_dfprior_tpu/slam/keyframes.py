"""Device-resident keyframe ring buffer + overlap-based window selection.

The reference keeps keyframe images in per-process CPU dicts and re-uploads
them every mapping iteration (ref: src/Mapper.py:79-80, 414-423); here the
keyframe store is a fixed-capacity stack of device arrays updated once per
keyframe insertion, so the jitted mapping step indexes frames with a gather
instead of host traffic.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np


class KeyframeStore:
    """Fixed-capacity keyframe set (color/depth/pose)."""

    def __init__(self, capacity: int, H: int, W: int):
        self.capacity = capacity
        self.H, self.W = H, W
        self.color = jnp.zeros((capacity, H, W, 3), dtype=jnp.float32)
        self.depth = jnp.zeros((capacity, H, W), dtype=jnp.float32)
        self.est_c2w = np.tile(np.eye(4, dtype=np.float32), (capacity, 1, 1))
        self.gt_c2w = np.tile(np.eye(4, dtype=np.float32), (capacity, 1, 1))
        self.frame_idx: List[int] = []  # dataset index per slot

    def __len__(self) -> int:
        return len(self.frame_idx)

    def add(
        self,
        idx: int,
        color: np.ndarray,
        depth: np.ndarray,
        est_c2w: np.ndarray,
        gt_c2w: np.ndarray,
    ) -> None:
        """Append a keyframe (ref: src/Mapper.py:560-565)."""
        slot = len(self.frame_idx)
        if slot >= self.capacity:
            raise RuntimeError(
                f"keyframe capacity {self.capacity} exceeded; increase "
                "mapping.keyframe_capacity"
            )
        self.color = self.color.at[slot].set(jnp.asarray(color))
        self.depth = self.depth.at[slot].set(jnp.asarray(depth))
        self.est_c2w[slot] = est_c2w
        self.gt_c2w[slot] = gt_c2w
        self.frame_idx.append(idx)

    def update_pose(self, slot: int, est_c2w: np.ndarray) -> None:
        self.est_c2w[slot] = est_c2w

    def poses_np(self) -> np.ndarray:
        return self.est_c2w[: len(self)]


def keyframe_selection_overlap(
    rng: np.random.Generator,
    gt_depth: np.ndarray,
    c2w: np.ndarray,
    keyframe_poses: np.ndarray,
    k: int,
    H: int,
    W: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    N_samples: int = 16,
    pixels: int = 100,
) -> List[int]:
    """Rank keyframes by view overlap with the current frame, pick k random.

    Vectorized host-side equivalent of the reference's per-keyframe numpy
    loop (ref: src/Mapper.py:160-222): sample `pixels` rays from the current
    view, take `N_samples` depth-ranged points per ray, project the resulting
    cloud into each candidate keyframe, score by fraction inside the image
    (20 px margin, in front of the camera).

    Args:
        keyframe_poses: (K, 4, 4) estimated c2w per keyframe (OpenGL).

    Returns:
        Up to k keyframe indices (into keyframe_poses) in random order.
    """
    K = len(keyframe_poses)
    if K == 0:
        return []
    percent_inside = keyframe_overlap_scores(
        rng, gt_depth, c2w, keyframe_poses, H, W, fx, fy, cx, cy,
        N_samples=N_samples, pixels=pixels,
    )

    # stable: ties keep insertion order, like the reference's sorted()
    # (ref: src/Mapper.py:216-217)
    order = np.argsort(-percent_inside, kind="stable")
    selected = [int(i) for i in order if percent_inside[i] > 0.0]
    perm = rng.permutation(len(selected))
    return [selected[int(p)] for p in perm[:k]]


def keyframe_overlap_scores(
    rng: np.random.Generator,
    gt_depth: np.ndarray,
    c2w: np.ndarray,
    keyframe_poses: np.ndarray,
    H: int,
    W: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    N_samples: int = 16,
    pixels: int = 100,
) -> np.ndarray:
    """Per-keyframe view-overlap scores for the current frame.

    The scoring half of keyframe_selection_overlap (ref:
    src/Mapper.py:160-222): sample ``pixels`` rays from the current view,
    take ``N_samples`` depth-ranged points per ray, project the cloud into
    each candidate keyframe, score by the fraction landing inside the
    image (20 px margin, in front of the camera). Also the revisit
    detector for the loop-closure stage (slam/loop_closure.py — a
    framework extension; the reference only uses the score for window
    selection).

    Returns:
        (K,) fraction-inside per keyframe.
    """
    jj = rng.integers(0, H, pixels)
    ii = rng.integers(0, W, pixels)
    d = gt_depth[jj, ii]  # (P,)

    dirs = np.stack(
        [(ii - cx) / fx, -(jj - cy) / fy, -np.ones_like(ii, dtype=np.float64)], axis=-1
    )
    Rw = c2w[:3, :3]
    rays_d = dirs @ Rw.T
    rays_o = c2w[:3, 3]

    t_vals = np.linspace(0.0, 1.0, N_samples)
    near = (d * 0.8)[:, None]
    far = (d + 0.5)[:, None]
    z_vals = near * (1 - t_vals) + far * t_vals  # (P, S)
    pts = rays_o[None, None, :] + rays_d[:, None, :] * z_vals[..., None]
    verts = pts.reshape(-1, 3)  # (P*S, 3)

    w2c = np.linalg.inv(keyframe_poses.astype(np.float64))  # (K, 4, 4)
    homo = np.concatenate([verts, np.ones((len(verts), 1))], axis=1)  # (N, 4)
    cam = np.einsum("kij,nj->kni", w2c, homo)[..., :3]  # (K, N, 3)
    cam[..., 0] *= -1  # OpenGL -> projection flip (ref: Mapper.py:204)
    z = cam[..., 2:3] + 1e-5
    u = fx * cam[..., 0:1] / z + cx
    v = fy * cam[..., 1:2] / z + cy
    edge = 20
    inside = (
        (u[..., 0] < W - edge)
        & (u[..., 0] > edge)
        & (v[..., 0] < H - edge)
        & (v[..., 0] > edge)
        & (z[..., 0] < 0)
    )
    return inside.mean(axis=1)  # (K,)
