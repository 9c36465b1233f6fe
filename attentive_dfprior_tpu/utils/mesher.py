"""Mesher: marching-cubes extraction of the learned scene surface.

TPU-native equivalent of the reference Mesher (ref: src/utils/Mesher.py):
  - occupancy queried on a uniform lattice via the jitted scene forward
    (chunked, stage 'high'), out-of-hull points forced to occ=100
  - scene hull built from keyframe depth back-projections + camera centers
    (the reference builds it with an open3d ScalableTSDFVolume mesh +
    convex hull, ref: Mesher.py:219-284; we back-project the same depth maps
    directly — same hull, no open3d)
  - mesh cleaned by keyframe-frustum visibility and connected-component
    area (ref: Mesher.py:488-510)
  - vertex colors by direct point query at stage 'color' (ref: Mesher.py:514-529)
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from attentive_dfprior_tpu.camera import Camera
from attentive_dfprior_tpu.models.decoders import eval_points_chunk
from attentive_dfprior_tpu.render.renderer import RenderConfig
from attentive_dfprior_tpu.utils.marching_cubes import marching_cubes
from attentive_dfprior_tpu.utils.mesh import (
    convex_hull_mesh,
    cull_faces_by_vertex_mask,
    filter_small_components,
    points_in_hull,
    reindex_mesh,
)
from attentive_dfprior_tpu.utils.ply import write_ply




class Mesher:
    def __init__(
        self,
        cfg: Dict[str, Any],
        cam: Camera,
        bound: np.ndarray,
        tsdf_bnds,
        points_batch_size: int = 2**17,
    ):
        mcfg = cfg["meshing"]
        self.cam = cam
        self.bound = jnp.asarray(bound, dtype=jnp.float32)
        self.tsdf_bnds = jnp.asarray(np.asarray(tsdf_bnds), dtype=jnp.float32)
        self.resolution = int(mcfg["resolution"])
        self.level_set = float(mcfg["level_set"])
        self.clean_mesh_bound_scale = float(mcfg["clean_mesh_bound_scale"])
        self.remove_small_geometry_threshold = float(
            mcfg["remove_small_geometry_threshold"]
        )
        self.get_largest_components = bool(mcfg["get_largest_components"])
        self.remove_hull_artifacts = bool(mcfg.get("remove_hull_artifacts", True))
        self.points_batch_size = points_batch_size
        # Meshing is a pure-forward query: route decoder MLPs through the
        # fused Pallas kernel when on a TPU backend.
        # DFPRIOR_NO_FUSED_EVAL=1 is the escape hatch (also used to check
        # fused/unfused parity at the CLI surface).
        self.use_fused = (
            jax.default_backend() == "tpu"
            and os.environ.get("DFPRIOR_NO_FUSED_EVAL") != "1"
        )
        self.scale = float(cfg.get("scale", 1))
        self.marching_cubes_bound = np.array(
            cfg["mapping"]["marching_cubes_bound"], dtype=np.float64
        ) * self.scale
        self.verbose = bool(cfg.get("verbose", False))

    # ------------------------------------------------------------------

    def get_grid_uniform(self, resolution: int):
        """Padded uniform query lattice (ref: Mesher.py:365-393)."""
        b = self.marching_cubes_bound
        padding = 0.05
        x = np.linspace(b[0][0] - padding, b[0][1] + padding, resolution)
        y = np.linspace(b[1][0] - padding, b[1][1] + padding, resolution)
        z = np.linspace(b[2][0] - padding, b[2][1] + padding, resolution)
        return x, y, z

    def eval_points(
        self, params, points: np.ndarray, tsdf_volume, stage: str = "high"
    ) -> np.ndarray:
        """Chunked occupancy/color query; pads the tail chunk to keep one
        compiled executable (ref: Mesher.py:286-326)."""
        bs = self.points_batch_size
        outs = []
        n = len(points)
        for i in range(0, n, bs):
            chunk = points[i : i + bs]
            m = len(chunk)
            if m < bs:
                chunk = np.pad(chunk, ((0, bs - m), (0, 0)))
            ret = eval_points_chunk(
                params,
                jnp.asarray(chunk, dtype=jnp.float32),
                tsdf_volume,
                self.tsdf_bnds,
                self.bound,
                stage,
                fused=self.use_fused,
            )
            outs.append(np.asarray(ret[:m]))
        return np.concatenate(outs, axis=0)

    # ------------------------------------------------------------------

    def get_bound_from_frames(
        self,
        kf_depths: np.ndarray,  # (K, H, W)
        kf_c2w: np.ndarray,  # (K, 4, 4)
        depth_stride: int = 8,
    ):
        """Convex hull of observed geometry + camera centers
        (role of ref: Mesher.py:219-284)."""
        cam = self.cam
        pts: List[np.ndarray] = [kf_c2w[:, :3, 3]]
        jj, ii = np.meshgrid(
            np.arange(0, cam.H, depth_stride),
            np.arange(0, cam.W, depth_stride),
            indexing="ij",
        )
        dirs = np.stack(
            [
                (ii - cam.cx) / cam.fx,
                -(jj - cam.cy) / cam.fy,
                -np.ones_like(ii, dtype=np.float64),
            ],
            axis=-1,
        ).reshape(-1, 3)
        for k in range(len(kf_depths)):
            d = kf_depths[k][::depth_stride, ::depth_stride].reshape(-1)
            valid = d > 0
            if not valid.any():
                continue
            R = kf_c2w[k][:3, :3]
            o = kf_c2w[k][:3, 3]
            world = o + (dirs[valid] @ R.T) * d[valid][:, None]
            pts.append(world)
        cloud = np.concatenate(pts, axis=0)
        hv, hf, dela = convex_hull_mesh(cloud, scale=self.clean_mesh_bound_scale)
        return dela

    def point_masks(
        self,
        points: np.ndarray,
        kf_c2w: np.ndarray,
        kf_max_depths: np.ndarray,
        all_c2w: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Seen mask: in some keyframe frustum, in front, within 1.1*max depth
        (ref: Mesher.py:58-217, depth_test=False branch). If ``all_c2w``
        given, use every frame pose instead (eval_rec mode,
        ref: Mesher.py:93-130)."""
        cam = self.cam
        poses = all_c2w if all_c2w is not None else kf_c2w
        seen = np.zeros(len(points), dtype=bool)
        homo = np.concatenate([points, np.ones((len(points), 1))], axis=1)
        for k in range(len(poses)):
            c2w = poses[k].astype(np.float64)
            if not np.isfinite(c2w).all():
                continue
            w2c = np.linalg.inv(c2w)
            camp = (w2c @ homo.T).T[:, :3]
            camp[:, 0] *= -1
            z = camp[:, 2] + 1e-8
            u = cam.fx * camp[:, 0] / z + cam.cx
            v = cam.fy * camp[:, 1] / z + cam.cy
            m = (u < cam.W) & (u > 0) & (v < cam.H) & (v > 0) & (z < 0)
            if all_c2w is None:
                max_d = kf_max_depths[k] * 1.1
                m &= (-camp[:, 2]) < max_d
            seen |= m
        return seen

    # ------------------------------------------------------------------

    def get_mesh(
        self,
        mesh_out_file: str,
        params: Any,
        tsdf_volume,
        kf_depths: np.ndarray,
        kf_c2w: np.ndarray,
        estimate_c2w_list: Optional[np.ndarray] = None,
        idx: Optional[int] = None,
        color: bool = True,
        clean_mesh: bool = True,
        get_mask_use_all_frames: bool = False,
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Extract, clean, colorize, and export the scene mesh
        (ref: Mesher.py:395-542)."""
        xs, ys, zs = self.get_grid_uniform(self.resolution)
        X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
        points = np.stack([X, Y, Z], axis=-1).reshape(-1, 3).astype(np.float32)

        if len(kf_depths) > 0:
            dela = self.get_bound_from_frames(kf_depths, kf_c2w)
            in_hull = points_in_hull(points, dela)
        else:
            in_hull = np.ones(len(points), dtype=bool)

        occ = self.eval_points(params, points, tsdf_volume, stage="high")[:, 3]
        occ[~in_hull] = 100.0
        vol = occ.reshape(len(xs), len(ys), len(zs))

        if self.verbose:
            print("begin marching cubes...")
        try:
            verts, faces, normals = marching_cubes(
                vol,
                level=self.level_set,
                spacing=(xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0]),
            )
        except Exception as e:  # no surface at the level set
            print(f"marching_cubes error: {e}")
            return None
        if len(faces) == 0:
            print("marching_cubes: no surface extracted")
            return None
        verts = verts + np.array([xs[0], ys[0], zs[0]])

        if self.remove_hull_artifacts and len(verts) > 0:
            # The out-of-hull occ=100 override (matching ref: Mesher.py:450)
            # manufactures a zero-crossing sheet AT the convex-hull boundary.
            # On full-coverage trajectories the hull hugs the walls and the
            # sheet hides behind real surfaces, but on partial scans the hull
            # cuts through unobserved air and the sheet survives frustum
            # culling as large mid-air "walls". Real surface vertices sit at
            # the learned field's zero crossing (|occ| ~ 0 after marching
            # interpolation); hull-sheet vertices sit in decisively free
            # space. Re-query the field and drop faces whose vertices are
            # all clearly free. (Improvement over the reference, which keeps
            # these artifacts; disable with meshing.remove_hull_artifacts.)
            occ_v = self.eval_points(
                params, verts.astype(np.float32), tsdf_volume, stage="high"
            )[:, 3]
            clearly_free = occ_v < -0.5
            keep = ~clearly_free[faces].all(axis=1)
            faces = faces[keep]
            verts, faces = reindex_mesh(verts, faces)

        if clean_mesh and len(kf_c2w) > 0:
            kf_max_d = np.array([d.max() for d in kf_depths])
            seen = self.point_masks(
                verts,
                kf_c2w,
                kf_max_d,
                all_c2w=(
                    estimate_c2w_list[: (idx or 0) + 1]
                    if get_mask_use_all_frames and estimate_c2w_list is not None
                    else None
                ),
            )
            faces = cull_faces_by_vertex_mask(verts, faces, ~seen)
            verts, faces = reindex_mesh(verts, faces)
            verts, faces = filter_small_components(
                verts,
                faces,
                min_area=self.remove_small_geometry_threshold
                * self.scale
                * self.scale,
                keep_largest_only=self.get_largest_components,
            )

        vertex_colors = None
        if color and len(verts) > 0:
            rgb = self.eval_points(
                params, verts.astype(np.float32), tsdf_volume, stage="color"
            )[:, :3]
            vertex_colors = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)

        verts_out = verts / self.scale
        write_ply(mesh_out_file, verts_out, faces, colors=vertex_colors)
        if self.verbose:
            print("Saved mesh at", mesh_out_file)
        return verts_out, faces
