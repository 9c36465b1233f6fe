"""Differentiable camera pose parameterization: quaternion + translation.

Replaces the reference's torch quaternion math and its `mathutils` C-extension
dependency (ref: src/common.py:139-203) with pure JAX/NumPy. The quaternion
convention is (w, x, y, z), matching the reference's camera tensor layout
``[qw, qx, qy, qz, tx, ty, tz]``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def quat_to_rotation(quad: jnp.ndarray) -> jnp.ndarray:
    """Quaternion(s) -> rotation matrix/matrices, differentiable.

    Uses the normalized form ``2/|q|^2`` so non-unit quaternions (as produced
    mid-optimization) still map to valid rotations (ref: src/common.py:139-162).

    Args:
        quad: (..., 4) quaternion(s), (w, x, y, z).

    Returns:
        (..., 3, 3) rotation matrices.
    """
    qr, qi, qj, qk = quad[..., 0], quad[..., 1], quad[..., 2], quad[..., 3]
    two_s = 2.0 / jnp.sum(quad * quad, axis=-1)
    r00 = 1 - two_s * (qj**2 + qk**2)
    r01 = two_s * (qi * qj - qk * qr)
    r02 = two_s * (qi * qk + qj * qr)
    r10 = two_s * (qi * qj + qk * qr)
    r11 = 1 - two_s * (qi**2 + qk**2)
    r12 = two_s * (qj * qk - qi * qr)
    r20 = two_s * (qi * qk - qj * qr)
    r21 = two_s * (qj * qk + qi * qr)
    r22 = 1 - two_s * (qi**2 + qj**2)
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def rotation_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z). Host-side numpy.

    Shepperd's method (numerically stable branch selection). Replaces the
    reference's mathutils dependency (ref: src/common.py:181-203). Any sign
    choice parameterizes the same rotation; we fix w >= 0.
    """
    R = np.asarray(R, dtype=np.float64)
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z], dtype=np.float64)
    if q[0] < 0:
        q = -q
    return q / np.linalg.norm(q)


def pose_matrix_from_tensor(camera_tensor: jnp.ndarray) -> jnp.ndarray:
    """Camera tensor [qw,qx,qy,qz,tx,ty,tz] -> 3x4 (or batched) c2w matrix.

    Differentiable; the tracker optimizes through this
    (ref: src/common.py:165-178).
    """
    squeeze = camera_tensor.ndim == 1
    if squeeze:
        camera_tensor = camera_tensor[None]
    quad, T = camera_tensor[:, :4], camera_tensor[:, 4:]
    R = quat_to_rotation(quad)
    RT = jnp.concatenate([R, T[:, :, None]], axis=2)  # (B, 3, 4)
    return RT[0] if squeeze else RT


def pose_tensor_from_matrix(RT: np.ndarray, Tquad: bool = False) -> np.ndarray:
    """c2w matrix (3x4 or 4x4) -> camera tensor [qw,qx,qy,qz,tx,ty,tz].

    Host-side (used only at tracker init; ref: src/common.py:181-203).
    """
    RT = np.asarray(RT, dtype=np.float64)
    R, T = RT[:3, :3], RT[:3, 3]
    quad = rotation_to_quat(R)
    if Tquad:
        out = np.concatenate([T, quad], 0)
    else:
        out = np.concatenate([quad, T], 0)
    return out.astype(np.float32)


def homogenize(RT: jnp.ndarray) -> jnp.ndarray:
    """3x4 -> 4x4 by appending [0,0,0,1]."""
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=RT.dtype)
    return jnp.concatenate([RT, bottom], axis=0)


def clamp_pose_update(
    orig: np.ndarray,
    new: np.ndarray,
    max_dt: float,
    max_rot_rad: float,
) -> np.ndarray:
    """Trust-region clamp for a pose update (host-side numpy).

    Bundle adjustment's pose-map feedback can run away: one bad tracker
    frame drags keyframe poses, which warps the map, which misleads the
    tracker (measured: the unclamped BA demo config diverged to 77 cm ATE
    on one of three seeds, ABLATE_TRACKING_r04.json). Bounding each BA
    write-back to ``max_dt`` meters of translation and ``max_rot_rad`` of
    rotation keeps corrections incremental — a large genuine correction is
    still reached over several mapped frames, but a divergent excursion
    cannot capture the map in one step.

    Args:
        orig / new: (4, 4) c2w poses before/after the BA update.

    Returns:
        (4, 4) clamped pose.
    """
    orig = np.asarray(orig, dtype=np.float64)
    new = np.asarray(new, dtype=np.float64)
    dt = new[:3, 3] - orig[:3, 3]
    n = float(np.linalg.norm(dt))
    if n > max_dt:
        dt = dt * (max_dt / n)

    dR = new[:3, :3] @ orig[:3, :3].T
    # axis-angle of the delta rotation
    cos_a = np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0)
    ang = float(np.arccos(cos_a))
    if ang > max_rot_rad and ang > 1e-9:
        axis = np.array(
            [dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0], dR[1, 0] - dR[0, 1]]
        )
        an = np.linalg.norm(axis)
        if an > 1e-12:
            axis = axis / an
            a = max_rot_rad
            K = np.array(
                [
                    [0.0, -axis[2], axis[1]],
                    [axis[2], 0.0, -axis[0]],
                    [-axis[1], axis[0], 0.0],
                ]
            )
            dR = np.eye(3) + np.sin(a) * K + (1.0 - np.cos(a)) * (K @ K)
        else:
            # Near-180 deg delta: the antisymmetric part vanishes
            # (|axis| = 2 sin(ang) -> 0 as ang -> pi), so no reliable
            # clamp axis exists. Reject the rotation update entirely
            # (keep orig's rotation) — passing the raw dR through here
            # would wave the wildest excursions past the trust region.
            dR = np.eye(3)

    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = (dR @ orig[:3, :3]).astype(np.float32)
    out[:3, 3] = (orig[:3, 3] + dt).astype(np.float32)
    return out
