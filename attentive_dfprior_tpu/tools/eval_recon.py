"""3D/2D reconstruction evaluation (Replica protocol).

Equivalent of the reference's src/tools/eval_recon.py:
  - 3D: ICP-align the reconstructed mesh to GT, then accuracy (pred->GT
    nearest-neighbor distance), completion (GT->pred), completion ratio
    (< 5 cm), over 200k surface samples (ref: eval_recon.py:32-125).
  - 2D: depth-L1 over N random interior views; views rejected when they see
    unseen GT regions (ref: eval_recon.py:139-218). The offscreen renders use
    our native C++ rasterizer instead of open3d.
"""

from __future__ import annotations

import argparse
from typing import Optional, Tuple

import numpy as np
from scipy.spatial import cKDTree as KDTree

from attentive_dfprior_tpu.utils.ply import read_ply


def sample_surface(
    verts: np.ndarray, faces: np.ndarray, n: int, rng: np.random.Generator
) -> np.ndarray:
    """Uniform area-weighted surface sampling (trimesh.sample equivalent)."""
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    probs = areas / areas.sum()
    idx = rng.choice(len(faces), size=n, p=probs)
    r1 = np.sqrt(rng.uniform(size=(n, 1)))
    r2 = rng.uniform(size=(n, 1))
    return (
        (1 - r1) * v0[idx] + r1 * (1 - r2) * v1[idx] + r1 * r2 * v2[idx]
    )


def icp_align(
    source: np.ndarray,
    target: np.ndarray,
    iters: int = 30,
    threshold: float = 0.1,
) -> np.ndarray:
    """Point-to-point ICP returning a 4x4 transform aligning source->target.

    Replaces o3d registration_icp (ref: eval_recon.py:53-67); same role —
    a small rigid correction before computing distances.
    """
    T = np.eye(4)
    src = source.copy()
    tree = KDTree(target)
    prev_err = np.inf
    for _ in range(iters):
        dist, idx = tree.query(src)
        mask = dist < threshold
        if mask.sum() < 10:
            break
        p = src[mask]
        q = target[idx[mask]]
        pc = p - p.mean(0)
        qc = q - q.mean(0)
        W = pc.T @ qc
        U, _, Vh = np.linalg.svd(W)
        S = np.eye(3)
        if np.linalg.det(U @ Vh) < 0:
            S[2, 2] = -1
        R = Vh.T @ S @ U.T
        t = q.mean(0) - R @ p.mean(0)
        src = src @ R.T + t
        Ti = np.eye(4)
        Ti[:3, :3] = R
        Ti[:3, 3] = t
        T = Ti @ T
        err = dist[mask].mean()
        if abs(prev_err - err) < 1e-7:
            break
        prev_err = err
    return T


def accuracy(gt_points: np.ndarray, rec_points: np.ndarray) -> float:
    """Mean rec->GT NN distance (ref: eval_recon.py:32-36)."""
    d, _ = KDTree(gt_points).query(rec_points)
    return float(d.mean())


def completion(gt_points: np.ndarray, rec_points: np.ndarray) -> float:
    """Mean GT->rec NN distance (ref: eval_recon.py:39-43)."""
    d, _ = KDTree(rec_points).query(gt_points)
    return float(d.mean())


def completion_ratio(
    gt_points: np.ndarray, rec_points: np.ndarray, dist_th: float = 0.05
) -> float:
    """% of GT points within dist_th of the reconstruction
    (ref: eval_recon.py:46-50)."""
    d, _ = KDTree(rec_points).query(gt_points)
    return float((d < dist_th).astype(np.float32).mean())


def calc_3d_metric(
    rec_verts: np.ndarray,
    rec_faces: np.ndarray,
    gt_verts: np.ndarray,
    gt_faces: np.ndarray,
    n_samples: int = 200_000,
    align: bool = True,
    seed: int = 0,
) -> dict:
    """3D metrics over surface samples (ref: eval_recon.py:99-125)."""
    rng = np.random.default_rng(seed)
    rec_pc = sample_surface(rec_verts, rec_faces, n_samples, rng)
    gt_pc = sample_surface(gt_verts, gt_faces, n_samples, rng)
    if align:
        T = icp_align(rec_pc[:: max(1, n_samples // 20000)], gt_pc[:: max(1, n_samples // 20000)])
        rec_pc = rec_pc @ T[:3, :3].T + T[:3, 3]
    acc = accuracy(gt_pc, rec_pc)
    comp = completion(gt_pc, rec_pc)
    ratio = completion_ratio(gt_pc, rec_pc)
    return {
        "accuracy_cm": acc * 100,
        "completion_cm": comp * 100,
        "completion_ratio_pct": ratio * 100,
    }


def get_cam_position(gt_verts: np.ndarray):
    """Random interior camera placement helper (ref: eval_recon.py:70-82):
    poses are sampled inside a shrunken scene bounding box."""
    lo = gt_verts.min(0)
    hi = gt_verts.max(0)
    ext = hi - lo
    center = (hi + lo) / 2
    return lo + 0.1 * ext, hi - 0.1 * ext, center


def calc_2d_metric(
    rec_verts: np.ndarray,
    rec_faces: np.ndarray,
    gt_verts: np.ndarray,
    gt_faces: np.ndarray,
    n_imgs: int = 1000,
    seed: int = 0,
    H: int = 500,
    W: int = 500,
    focal: float = 300.0,
) -> Optional[dict]:
    """Depth-L1 over random interior views (ref: eval_recon.py:139-218).

    Views whose GT render contains holes (unseen regions) are rejected, like
    the reference's unseen-region check.
    """
    from attentive_dfprior_tpu import native

    if not native.available():
        print("WARNING: native rasterizer unavailable; skipping 2D metric")
        return None

    rng = np.random.default_rng(seed)
    lo, hi, center = get_cam_position(gt_verts)
    cx, cy = W / 2 - 0.5, H / 2 - 0.5

    errors = []
    tries = 0
    while len(errors) < n_imgs and tries < n_imgs * 10:
        tries += 1
        eye = rng.uniform(lo, hi)
        # random look direction
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        up = np.array([0.0, 1.0, 0.0])
        if abs(np.dot(up, d)) > 0.95:
            up = np.array([1.0, 0.0, 0.0])
        right = np.cross(d, up)
        right /= np.linalg.norm(right)
        up2 = np.cross(right, d)
        # OpenCV convention: +z forward
        c2w = np.eye(4)
        c2w[:3, 0] = right
        c2w[:3, 1] = up2
        c2w[:3, 2] = d
        c2w[:3, 3] = eye
        w2c = np.linalg.inv(c2w)

        gt_depth = native.rasterize_depth(
            gt_verts, gt_faces, w2c, focal, focal, cx, cy, H, W
        )
        if (gt_depth == 0).mean() > 0.02:  # sees unseen region -> reject
            continue
        rec_depth = native.rasterize_depth(
            rec_verts, rec_faces, w2c, focal, focal, cx, cy, H, W
        )
        valid = (gt_depth > 0) & (rec_depth > 0)
        if valid.mean() < 0.5:
            continue
        errors.append(np.abs(gt_depth[valid] - rec_depth[valid]).mean())

    if not errors:
        return None
    return {"depth_l1_cm": float(np.mean(errors) * 100), "n_views": len(errors)}


def main():
    parser = argparse.ArgumentParser(description="Reconstruction evaluation")
    parser.add_argument("--rec_mesh", required=True)
    parser.add_argument("--gt_mesh", required=True)
    parser.add_argument("-3d", "--metric_3d", action="store_true")
    parser.add_argument("-2d", "--metric_2d", action="store_true")
    parser.add_argument("--n_imgs", type=int, default=1000)
    args = parser.parse_args()

    rec_v, rec_f, _ = read_ply(args.rec_mesh)
    gt_v, gt_f, _ = read_ply(args.gt_mesh)
    if args.metric_3d or not args.metric_2d:
        print(calc_3d_metric(rec_v, rec_f, gt_v, gt_f))
    if args.metric_2d:
        print(calc_2d_metric(rec_v, rec_f, gt_v, gt_f, n_imgs=args.n_imgs))


if __name__ == "__main__":
    main()
