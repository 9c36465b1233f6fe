"""Mesh culling: drop faces never seen by any camera of a trajectory.

Equivalent of the reference's src/tools/cull_mesh.py:22-76 (used to produce
culled GT meshes for evaluation). Intrinsics default to the Replica camera,
as the reference hardcodes (ref: cull_mesh.py:32-39), but are configurable.
"""

from __future__ import annotations

import argparse

import numpy as np

from attentive_dfprior_tpu.utils.mesh import reindex_mesh
from attentive_dfprior_tpu.utils.ply import read_ply, write_ply


def cull_mesh(
    verts: np.ndarray,
    faces: np.ndarray,
    poses: np.ndarray,
    H: int = 680,
    W: int = 1200,
    fx: float = 600.0,
    fy: float = 600.0,
    cx: float = 599.5,
    cy: float = 339.5,
):
    """Keep faces with at least one vertex inside some frustum."""
    seen = np.zeros(len(verts), dtype=bool)
    homo = np.concatenate([verts, np.ones((len(verts), 1))], axis=1)
    for i in range(len(poses)):
        c2w = poses[i].astype(np.float64)
        if not np.isfinite(c2w).all() or np.allclose(c2w, 0):
            continue
        w2c = np.linalg.inv(c2w)
        cam = (w2c @ homo.T).T[:, :3]
        cam[:, 0] *= -1
        z = cam[:, 2] + 1e-8
        u = fx * cam[:, 0] / z + cx
        v = fy * cam[:, 1] / z + cy
        seen |= (u < W) & (u > 0) & (v < H) & (v > 0) & (z < 0)
    keep = seen[faces].any(axis=1)
    return reindex_mesh(verts, faces[keep])


def main():
    parser = argparse.ArgumentParser(description="cull mesh by camera frustums")
    parser.add_argument("--input_mesh", required=True)
    parser.add_argument("--output_mesh", required=True)
    parser.add_argument("--traj", required=True, help="traj.txt (Replica format) or ckpt .npz")
    parser.add_argument("--H", type=int, default=680)
    parser.add_argument("--W", type=int, default=1200)
    parser.add_argument("--fx", type=float, default=600.0)
    parser.add_argument("--fy", type=float, default=600.0)
    parser.add_argument("--cx", type=float, default=599.5)
    parser.add_argument("--cy", type=float, default=339.5)
    args = parser.parse_args()

    verts, faces, colors = read_ply(args.input_mesh)
    if args.traj.endswith(".npz"):
        poses = np.load(args.traj)["gt_c2w_list"]
    else:
        rows = np.loadtxt(args.traj).reshape(-1, 4, 4)
        rows[:, :3, 1] *= -1
        rows[:, :3, 2] *= -1  # OpenCV -> OpenGL like the dataset loaders
        poses = rows
    verts2, faces2 = cull_mesh(
        verts, faces, poses, args.H, args.W, args.fx, args.fy, args.cx, args.cy
    )
    write_ply(args.output_mesh, verts2, faces2)
    print(f"culled {len(faces) - len(faces2)} / {len(faces)} faces -> {args.output_mesh}")


if __name__ == "__main__":
    main()
