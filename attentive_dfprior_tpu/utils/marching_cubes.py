"""Iso-surface extraction from dense scalar volumes.

The reference relies on ``skimage.measure.marching_cubes`` (Cython;
ref: src/utils/Mesher.py:464-477, src/fusion.py:309,330). That dependency is
not available here, so we provide our own extractor using the *marching
tetrahedra* algorithm: every cell is split into 6 tetrahedra around the main
diagonal and each tetrahedron's 16 sign configurations are handled by a small
programmatically-derived table (no 256-entry MC tables to transcribe).
Vertices are linearly interpolated on tet edges and deduplicated by global
edge id, so the output mesh has shared vertices (required for connected-
component culling downstream).

A native C++ implementation (attentive_dfprior_tpu/native) is used when the
shared library has been built; this numpy version is the always-available
fallback and the golden reference for its tests.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

# Cube corner offsets (x, y, z)
_CORNERS = np.array(
    [
        [0, 0, 0],  # 0
        [1, 0, 0],  # 1
        [1, 1, 0],  # 2
        [0, 1, 0],  # 3
        [0, 0, 1],  # 4
        [1, 0, 1],  # 5
        [1, 1, 1],  # 6
        [0, 1, 1],  # 7
    ],
    dtype=np.int64,
)

# Six-tetrahedra decomposition of the cube around diagonal 0-6.
_TETS = np.array(
    [
        [0, 5, 1, 6],
        [0, 1, 2, 6],
        [0, 2, 3, 6],
        [0, 3, 7, 6],
        [0, 7, 4, 6],
        [0, 4, 5, 6],
    ],
    dtype=np.int64,
)


def _build_tet_table() -> List[List[Tuple[Tuple[int, int], ...]]]:
    """For each 4-bit inside-code, the triangles as triples of tet-edge
    (cornerA, cornerB) pairs. Derived by case analysis, not transcribed."""
    table: List[List[Tuple[Tuple[int, int], ...]]] = []
    for code in range(16):
        inside = [bool(code & (1 << i)) for i in range(4)]
        n_in = sum(inside)
        tris: List[Tuple[Tuple[int, int], ...]] = []
        if n_in == 1:
            a = inside.index(True)
            outs = [i for i in range(4) if i != a]
            tris.append(((a, outs[0]), (a, outs[1]), (a, outs[2])))
        elif n_in == 3:
            b = inside.index(False)
            ins = [i for i in range(4) if i != b]
            tris.append(((ins[0], b), (ins[2], b), (ins[1], b)))
        elif n_in == 2:
            ins = [i for i in range(4) if inside[i]]
            outs = [i for i in range(4) if not inside[i]]
            # quad with corners on edges (i0,o0),(i0,o1),(i1,o1),(i1,o0)
            e00 = (ins[0], outs[0])
            e01 = (ins[0], outs[1])
            e11 = (ins[1], outs[1])
            e10 = (ins[1], outs[0])
            tris.append((e00, e01, e11))
            tris.append((e00, e11, e10))
        table.append(tris)
    return table


_TET_TABLE = _build_tet_table()


def marching_cubes(
    volume: np.ndarray,
    level: float = 0.0,
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    chunk_z: int = 64,
    use_native: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dispatch: native C++ fast path when built, numpy golden otherwise."""
    if use_native:
        try:
            from attentive_dfprior_tpu import native

            if native.available():
                verts, faces = native.marching_tets(
                    np.ascontiguousarray(volume, dtype=np.float64), float(level)
                )
                verts = verts * np.asarray(spacing, dtype=np.float64)[None, :]
                return verts, faces, _vertex_normals(verts, faces)
        except Exception:
            pass
    return marching_cubes_numpy(volume, level, spacing, chunk_z)


def marching_cubes_numpy(
    volume: np.ndarray,
    level: float = 0.0,
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    chunk_z: int = 64,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract the ``level`` iso-surface of a (X, Y, Z) scalar volume.

    Args:
        volume: (X, Y, Z) float array.
        level: iso value.
        spacing: voxel pitch per axis (like skimage's ``spacing``).
        chunk_z: z-slab size for bounded memory on large volumes.

    Returns:
        verts: (V, 3) float64 vertex positions in index space * spacing.
        faces: (F, 3) int64 vertex indices.
        normals: (V, 3) float64 per-vertex normals (area-weighted).
    """
    volume = np.ascontiguousarray(volume, dtype=np.float64)
    X, Y, Z = volume.shape
    if min(X, Y, Z) < 2:
        raise ValueError("volume must be at least 2 voxels in every axis")

    all_edge_keys: List[np.ndarray] = []
    all_edge_t: List[np.ndarray] = []

    # Gather all crossing edges (as global corner-id pairs) per chunk, then
    # dedup globally so chunk boundaries share vertices.
    tri_keys_chunks: List[np.ndarray] = []  # (T, 3, 2) corner-id pairs

    for z0 in range(0, Z - 1, chunk_z):
        z1 = min(z0 + chunk_z, Z - 1)  # cells span [z0, z1)
        nz = z1 - z0
        if nz <= 0:
            continue
        # cell index grids
        ci, cj, ck = np.meshgrid(
            np.arange(X - 1), np.arange(Y - 1), np.arange(z0, z1), indexing="ij"
        )
        ci = ci.ravel()
        cj = cj.ravel()
        ck = ck.ravel()

        corner_vals = np.empty((8, ci.size), dtype=np.float64)
        corner_ids = np.empty((8, ci.size), dtype=np.int64)
        for c in range(8):
            dx, dy, dz = _CORNERS[c]
            ii, jj, kk = ci + dx, cj + dy, ck + dz
            corner_vals[c] = volume[ii, jj, kk]
            corner_ids[c] = (ii * Y + jj) * Z + kk

        inside = corner_vals > level  # (8, Ncells)

        for tet in _TETS:
            code = (
                inside[tet[0]].astype(np.int64)
                + 2 * inside[tet[1]]
                + 4 * inside[tet[2]]
                + 8 * inside[tet[3]]
            )
            for c in range(1, 15):
                tris = _TET_TABLE[c]
                if not tris:
                    continue
                mask = code == c
                if not mask.any():
                    continue
                sel = np.nonzero(mask)[0]
                for tri in tris:
                    keys = np.empty((sel.size, 3, 2), dtype=np.int64)
                    for v, (a, b) in enumerate(tri):
                        ga = corner_ids[tet[a]][sel]
                        gb = corner_ids[tet[b]][sel]
                        keys[:, v, 0] = ga
                        keys[:, v, 1] = gb
                    tri_keys_chunks.append(keys)

    if not tri_keys_chunks:
        return (
            np.zeros((0, 3), dtype=np.float64),
            np.zeros((0, 3), dtype=np.int64),
            np.zeros((0, 3), dtype=np.float64),
        )

    tri_keys = np.concatenate(tri_keys_chunks, axis=0)  # (T, 3, 2)
    # canonical (sorted) pair + packed key
    lo = np.minimum(tri_keys[..., 0], tri_keys[..., 1])
    hi = np.maximum(tri_keys[..., 0], tri_keys[..., 1])
    NG = X * Y * Z
    packed = lo * NG + hi  # (T, 3)

    uniq, inverse = np.unique(packed.ravel(), return_inverse=True)
    faces = inverse.reshape(-1, 3).astype(np.int64)

    # compute vertex positions from the unique edges
    ua = uniq // NG
    ub = uniq % NG

    def unravel(ids):
        i = ids // (Y * Z)
        r = ids % (Y * Z)
        return np.stack([i, r // Z, r % Z], axis=-1).astype(np.float64)

    pa = unravel(ua)
    pb = unravel(ub)
    va = volume.ravel()[ua]
    vb = volume.ravel()[ub]
    denom = vb - va
    denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
    t = np.clip((level - va) / denom, 0.0, 1.0)
    verts = pa + t[:, None] * (pb - pa)
    verts *= np.asarray(spacing, dtype=np.float64)[None, :]

    # drop degenerate faces (repeated vertices)
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[good]

    normals = _vertex_normals(verts, faces)
    return verts, faces, normals


def _vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals."""
    if len(faces) == 0:
        return np.zeros_like(verts)
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)
    normals = np.zeros_like(verts)
    for i in range(3):
        np.add.at(normals, faces[:, i], fn)
    lens = np.linalg.norm(normals, axis=1, keepdims=True)
    lens = np.where(lens < 1e-12, 1.0, lens)
    return normals / lens
