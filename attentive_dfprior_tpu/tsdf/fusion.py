"""Volumetric TSDF fusion of RGB-D frames — the classical depth prior.

TPU-native replacement for the reference's embedded CUDA kernel + numba CPU
fallback (ref: src/fusion.py:21-341, kernel at :69-144). The voxel volume is
a dense (X, Y, Z) array, so projective TSDF integration maps naturally onto
one fused vectorized XLA kernel per frame: voxel -> world -> camera -> pixel,
nearest-depth lookup, truncation, running weighted average. No scatter is
needed (every voxel computes its own update), which is exactly the shape XLA
wants.

Semantics match the reference kernel:
  - tsdf init -1, weight init 0 (ref: fusion.py:52-54)
  - truncation margin = 5 * voxel_size (ref: fusion.py:38)
  - pixel = round(fx*x/z + cx) etc., nearest lookup (ref: fusion.py:107-108)
  - update only where depth > 0 and depth_diff >= -trunc; dist = min(1,
    depth_diff / trunc) (ref: fusion.py:115-128)
  - color fused as a per-channel running average. The reference packs RGB
    into one float (b*65536+g*256+r, ref: fusion.py:130-141); we keep 3
    channels — same math, no packing round-trip.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def integrate_frame(
    tsdf: jnp.ndarray,
    weight: jnp.ndarray,
    color: jnp.ndarray,
    depth_im: jnp.ndarray,
    color_im: jnp.ndarray,
    intr: jnp.ndarray,
    w2c: jnp.ndarray,
    vol_origin: jnp.ndarray,
    voxel_size: float,
    trunc_margin: float,
    obs_weight: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fuse one RGB-D frame into the TSDF volume (donated buffers -> in-place).

    Args:
        tsdf / weight: (X, Y, Z) float32 volumes.
        color: (X, Y, Z, 3) float32 running-average color volume.
        depth_im: (H, W) metric depth (0 = invalid).
        color_im: (H, W, 3) color in [0, 255] float.
        intr: (3, 3) camera intrinsics.
        w2c: (4, 4) world-to-camera (inverse pose), OpenCV convention
            (+z forward) — callers flip the OpenGL y/z axes first, exactly as
            the reference does before integration (ref: get_tsdf.py:79-83).
        vol_origin: (3,) world position of voxel (0,0,0).

    Returns:
        Updated (tsdf, weight, color).
    """
    X, Y, Z = tsdf.shape
    H, W = depth_im.shape
    f32 = tsdf.dtype

    vx = jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 0)
    vy = jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 1)
    vz = jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 2)

    # voxel -> world (ref: fusion.py:94-98)
    px = vol_origin[0] + vx.astype(f32) * voxel_size
    py = vol_origin[1] + vy.astype(f32) * voxel_size
    pz = vol_origin[2] + vz.astype(f32) * voxel_size

    # world -> camera (ref: fusion.py:100-105; kernel multiplies by R^T of
    # the c2w pose == rows of w2c)
    cx_ = w2c[0, 0] * px + w2c[0, 1] * py + w2c[0, 2] * pz + w2c[0, 3]
    cy_ = w2c[1, 0] * px + w2c[1, 1] * py + w2c[1, 2] * pz + w2c[1, 3]
    cz_ = w2c[2, 0] * px + w2c[2, 1] * py + w2c[2, 2] * pz + w2c[2, 3]

    # camera -> pixel, nearest (ref: fusion.py:107-108)
    safe_z = jnp.where(cz_ == 0, 1e-8, cz_)
    u = jnp.round(intr[0, 0] * (cx_ / safe_z) + intr[0, 2]).astype(jnp.int32)
    v = jnp.round(intr[1, 1] * (cy_ / safe_z) + intr[1, 2]).astype(jnp.int32)

    in_frustum = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (cz_ > 0)
    u_c = jnp.clip(u, 0, W - 1)
    v_c = jnp.clip(v, 0, H - 1)
    lin = v_c * W + u_c
    depth_val = jnp.take(depth_im.reshape(-1), lin.reshape(-1), axis=0).reshape(
        X, Y, Z
    )
    depth_val = jnp.where(in_frustum, depth_val, 0.0)

    depth_diff = depth_val - cz_
    valid = (depth_val > 0) & (depth_diff >= -trunc_margin)
    dist = jnp.minimum(1.0, depth_diff / trunc_margin)

    w_old = weight
    w_new = jnp.where(valid, w_old + obs_weight, w_old)
    denom = jnp.where(valid, w_new, 1.0)
    tsdf_new = jnp.where(
        valid, (tsdf * w_old + obs_weight * dist) / denom, tsdf
    )

    col = jnp.take(color_im.reshape(-1, 3), lin.reshape(-1), axis=0).reshape(
        X, Y, Z, 3
    )
    color_new = jnp.where(
        valid[..., None],
        jnp.minimum(
            255.0,
            jnp.round((color * w_old[..., None] + obs_weight * col) / denom[..., None]),
        ),
        color,
    )

    return tsdf_new, w_new, color_new


class TSDFVolume:
    """Host-facing TSDF fusion volume (API parity with ref: fusion.py:21-341).

    Keeps the volume on-device between frames; ``integrate`` dispatches the
    jitted fused update with donated buffers.
    """

    def __init__(self, vol_bnds: np.ndarray, voxel_size: float, with_color: bool = True):
        vol_bnds = np.asarray(vol_bnds, dtype=np.float64)
        assert vol_bnds.shape == (3, 2)
        self._voxel_size = float(voxel_size)
        self._trunc_margin = 5.0 * self._voxel_size
        self._vol_dim = (
            np.ceil((vol_bnds[:, 1] - vol_bnds[:, 0]) / self._voxel_size)
            .astype(int)
        )
        vol_bnds = vol_bnds.copy()
        vol_bnds[:, 1] = vol_bnds[:, 0] + self._vol_dim * self._voxel_size
        self._vol_bnds = vol_bnds
        self._vol_origin = vol_bnds[:, 0].astype(np.float32)

        X, Y, Z = (int(d) for d in self._vol_dim)
        self._tsdf = jnp.full((X, Y, Z), -1.0, dtype=jnp.float32)
        self._weight = jnp.zeros((X, Y, Z), dtype=jnp.float32)
        self._color = jnp.zeros((X, Y, Z, 3), dtype=jnp.float32)

    @property
    def vol_bnds(self) -> np.ndarray:
        return self._vol_bnds

    @property
    def voxel_size(self) -> float:
        return self._voxel_size

    def integrate(
        self,
        color_im: np.ndarray,
        depth_im: np.ndarray,
        cam_intr: np.ndarray,
        cam_pose: np.ndarray,
        obs_weight: float = 1.0,
    ) -> None:
        """Fuse one frame. ``cam_pose`` is camera-to-world in OpenCV
        convention (callers flip y/z from OpenGL first, ref: get_tsdf.py:79-83).
        """
        w2c = np.linalg.inv(np.asarray(cam_pose, dtype=np.float64)).astype(np.float32)
        self._tsdf, self._weight, self._color = integrate_frame(
            self._tsdf,
            self._weight,
            self._color,
            jnp.asarray(depth_im, dtype=jnp.float32),
            jnp.asarray(color_im, dtype=jnp.float32),
            jnp.asarray(cam_intr, dtype=jnp.float32),
            jnp.asarray(w2c),
            jnp.asarray(self._vol_origin),
            self._voxel_size,
            self._trunc_margin,
            float(obs_weight),
        )

    def get_volume(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(tsdf (X,Y,Z), color (X,Y,Z,3), bounds (3,2)) on host."""
        return (
            np.asarray(self._tsdf),
            np.asarray(self._color),
            self._vol_bnds,
        )

    def device_volume(self) -> jnp.ndarray:
        """The on-device (X, Y, Z) TSDF array, bit-faithful to the reference
        (unobserved voxels stay at the -1 init, ref: src/fusion.py:52)."""
        return self._tsdf

    def observed_mask(self) -> np.ndarray:
        """(X, Y, Z) bool: voxels touched by at least one depth frame."""
        return np.asarray(self._weight) > 0


    def get_mesh(self):
        """Marching-cubes surface of the fused TSDF (level 0), world coords.

        Returns (verts, faces, normals, colors_uint8) like the reference
        (ref: fusion.py:324-341). Faces touching unobserved voxels
        (fusion weight == 0) are dropped — observed-free <-> unobserved
        boundaries are not real surfaces (open3d's ScalableTSDFVolume masks
        them implicitly via its weight threshold).
        """
        from attentive_dfprior_tpu.utils.marching_cubes import (
            _vertex_normals,
            marching_cubes,
        )
        from attentive_dfprior_tpu.utils.mesh import reindex_mesh

        tsdf, color, _ = self.get_volume()
        weight = np.asarray(self._weight)
        verts, faces, _ = marching_cubes(tsdf, level=0.0)
        if len(verts):
            vidx = np.clip(np.round(verts).astype(int), 0, np.array(tsdf.shape) - 1)
            observed = weight[vidx[:, 0], vidx[:, 1], vidx[:, 2]] > 0
            faces = faces[observed[faces].all(axis=1)]
            verts, faces = reindex_mesh(verts, faces)
        normals = _vertex_normals(verts, faces)
        if len(verts):
            vidx = np.clip(np.round(verts).astype(int), 0, np.array(tsdf.shape) - 1)
            colors = color[vidx[:, 0], vidx[:, 1], vidx[:, 2]].astype(np.uint8)
        else:
            colors = np.zeros((0, 3), np.uint8)
        verts = verts * self._voxel_size + self._vol_origin
        return verts, faces, normals, colors

    def get_point_cloud(self) -> np.ndarray:
        """(N, 6) xyz + rgb surface point cloud (ref: fusion.py:303-322)."""
        verts, _, _, colors = self.get_mesh()
        return np.hstack([verts, colors.astype(np.float64)])


def fill_unobserved_volume(
    tsdf: np.ndarray, observed: np.ndarray, mode: str = "nearest"
) -> np.ndarray:
    """Fill never-observed voxels for SURFACE EXTRACTION.

    The reference initializes unobserved voxels to -1, i.e. "occupied"
    (ref: src/fusion.py:52). That is the right volume for training and
    tracking — the in-band transition at observation boundaries acts as a
    fence that stabilizes pose optimization (measured on the synthetic
    probe: perturbed-pose recovery 0.8 cm with the -1 init vs 3.6 cm with
    any filled volume). But for MESHING it is poison under partial
    coverage: trilinear interpolation between a -1 unobserved voxel and an
    observed in-band neighbor passes through the attentive-blend band and
    manufactures phantom surfaces in unobserved air (measured: mesh
    accuracy 6.5 cm -> 2.2 cm when filled). Hence two volumes: the mapper/
    tracker consume the reference-faithful one, the mesher queries this
    filled one.

    Modes: "nearest" (saturate to the sign of the nearest observed voxel —
    introduces no spurious crossing on either side), "free" (+1),
    "reference" (no-op).
    """
    if mode == "reference":
        return tsdf
    if not observed.any() or observed.all():
        return tsdf
    if mode == "free":
        return np.where(observed, tsdf, np.float32(1.0))
    if mode != "nearest":
        raise ValueError(f"unknown fill_unobserved mode {mode!r}")
    from scipy import ndimage

    ix = ndimage.distance_transform_edt(
        ~observed, return_distances=False, return_indices=True
    )
    nearest_sign = np.where(tsdf[tuple(ix)] >= 0, 1.0, -1.0).astype(tsdf.dtype)
    return np.where(observed, tsdf, nearest_sign)


def legacy_observed_mask(tsdf: np.ndarray) -> np.ndarray:
    """Recover an observed-voxel mask from a weightless legacy volume.

    Caches written by our builder store the fusion-weight mask explicitly;
    the reference's ``.pt`` volumes (and our pre-round-3 ``.npz`` caches)
    save only the TSDF values, where -1.0 is both the untouched init
    (ref: src/fusion.py:52) AND a legitimate running average for an observed
    voxel sitting exactly at the truncation clamp. Plain ``tsdf != -1.0``
    misclassifies the latter as unobserved, and ``fill_unobserved_volume``
    would then flip it to +1, eroding genuinely occupied space.

    Resolution: a voxel at exactly -1.0 is *ambiguous*; treat it as observed
    when any 6-neighbor is an observed voxel strictly inside the interior
    band (-1 < tsdf < 0) — the only place a clamped-at--1 running average
    can physically occur is one truncation step behind the band. A single
    dilation pass (not a flood fill: deep interior connected to the band is
    genuinely the untouched init and must stay unobserved so
    ``fill_unobserved_volume`` keeps it at the nearest observed sign).
    """
    observed = tsdf != -1.0
    if observed.all() or not observed.any():
        return observed
    band = observed & (tsdf < 0)
    adj = np.zeros_like(band)
    adj[1:, :, :] |= band[:-1, :, :]
    adj[:-1, :, :] |= band[1:, :, :]
    adj[:, 1:, :] |= band[:, :-1, :]
    adj[:, :-1, :] |= band[:, 1:, :]
    adj[:, :, 1:] |= band[:, :, :-1]
    adj[:, :, :-1] |= band[:, :, 1:]
    return observed | (~observed & adj)
