"""Offline TSDF-prior construction (the reference's get_tsdf.py pipeline).

Walks the dataset every ``space`` frames, fuses depth into the device TSDF
volume (tsdf/fusion.py), and saves volume + bounds (+ a marching-cubes mesh)
(ref: get_tsdf.py:44-138).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from attentive_dfprior_tpu.camera import Camera
from attentive_dfprior_tpu.models.scene import load_bound
from attentive_dfprior_tpu.tsdf.fusion import TSDFVolume
from attentive_dfprior_tpu.utils.datasets import get_dataset


def build_tsdf_volume(
    cfg: Dict[str, Any],
    args=None,
    space: int = 10,
    voxel_size: float = 4.0 / 256,
    save_mesh_path: Optional[str] = None,
) -> Tuple[jnp.ndarray, np.ndarray, TSDFVolume]:
    """Fuse the dataset's depth stream into a TSDF volume.

    Args:
        space: integrate every ``space``-th frame (1 for Replica, 10 for
            ScanNet in the reference, ref: get_tsdf.py usage in README).

    Returns:
        (tsdf (X, Y, Z) device array, adjusted bounds (3, 2), volume object)
    """
    cam = Camera.from_config(cfg)
    bound = load_bound(cfg)
    vol = TSDFVolume(bound, voxel_size=voxel_size)
    frame_reader = get_dataset(cfg, args, cfg.get("scale", 1))

    K = cam.K.astype(np.float32)
    for idx in range(len(frame_reader)):
        if idx % space != 0:
            continue
        _, gt_color, gt_depth, gt_c2w = frame_reader[idx]
        c2w = np.asarray(gt_c2w, dtype=np.float64).copy()
        if not np.isfinite(c2w).all():
            continue
        # OpenGL -> OpenCV for projection (ref: get_tsdf.py:79-83)
        c2w[:3, 1] *= -1.0
        c2w[:3, 2] *= -1.0
        color255 = (np.asarray(gt_color) * 255).astype(np.float32)
        vol.integrate(color255, np.asarray(gt_depth, np.float32), K, c2w)

    if save_mesh_path:
        from attentive_dfprior_tpu.utils.ply import write_ply

        verts, faces, normals, colors = vol.get_mesh()
        write_ply(save_mesh_path, verts, faces, colors=colors, normals=normals)

    return vol.device_volume(), vol.vol_bnds.astype(np.float32), vol


def save_tsdf_volume(cfg: Dict[str, Any], args=None, space: int = 10) -> str:
    """CLI body: build and persist ``{dataset}_tsdf_volume/...npz``
    (ref: get_tsdf.py:101-138)."""
    dataset = cfg["data"]["dataset"]
    scene_id = cfg["data"]["id"]
    base = f"{dataset}_tsdf_volume"
    os.makedirs(base, exist_ok=True)
    prefix = f"scene{scene_id}" if dataset == "scannet" else f"{scene_id}"

    voxel_size = float(cfg.get("tsdf", {}).get("voxel_size", 4.0 / 256))
    tsdf, bounds, vol = build_tsdf_volume(
        cfg,
        args,
        space=space,
        voxel_size=voxel_size,
        save_mesh_path=os.path.join(base, f"{prefix}_mesh.ply"),
    )
    out = os.path.join(base, f"{prefix}_tsdf_volume.npz")
    np.savez_compressed(
        out,
        tsdf=np.asarray(tsdf),
        bounds=bounds,
        voxel_size=np.float32(voxel_size),
        space=np.int32(space),
        # observedness mask (fusion weight > 0): lets the mesher fill
        # never-observed voxels without refusing (see fusion.device_volume)
        observed=np.asarray(vol.observed_mask()),
    )
    return out
