"""Marching-tetrahedra extraction, PLY I/O, and mesh-utility tests."""

import os

import numpy as np
import pytest

from attentive_dfprior_tpu.utils.marching_cubes import (
    marching_cubes,
    marching_cubes_numpy,
)
from attentive_dfprior_tpu.utils.mesh import (
    face_areas,
    filter_small_components,
    split_components,
)
from attentive_dfprior_tpu.utils.ply import read_ply, write_ply


def sphere_volume(n=32, r=10.0):
    g = np.mgrid[0:n, 0:n, 0:n].astype(float)
    return r - np.sqrt(((g - n / 2) ** 2).sum(0))


class TestMarchingCubes:
    def test_sphere_radius(self):
        vol = sphere_volume()
        verts, faces, normals = marching_cubes_numpy(vol, 0.0)
        r = np.linalg.norm(verts - 16, axis=1)
        assert abs(r.mean() - 10.0) < 0.05
        assert r.std() < 0.05
        assert len(faces) > 1000
        assert normals.shape == verts.shape

    def test_native_matches_numpy(self):
        from attentive_dfprior_tpu import native

        if not native.available():
            pytest.skip("native library not built")
        vol = sphere_volume(24, 8.0)
        v_np, f_np, _ = marching_cubes_numpy(vol, 0.0)
        v_nat, f_nat = native.marching_tets(vol, 0.0)
        assert len(v_np) == len(v_nat)
        assert len(f_np) == len(f_nat)
        # same vertex sets (order may differ)
        s1 = np.array(sorted(map(tuple, np.round(v_np, 6))))
        s2 = np.array(sorted(map(tuple, np.round(v_nat, 6))))
        np.testing.assert_allclose(s1, s2, atol=1e-6)

    def test_spacing_and_level(self):
        vol = sphere_volume()
        verts, _, _ = marching_cubes(vol, 2.0, spacing=(0.5, 0.5, 0.5))
        r = np.linalg.norm(verts - 8.0, axis=1)  # center scales too
        assert abs(r.mean() - 4.0) < 0.05  # (10-2) * 0.5

    def test_empty_volume(self):
        vol = -np.ones((8, 8, 8))
        verts, faces, _ = marching_cubes_numpy(vol, 0.0)
        assert len(verts) == 0 and len(faces) == 0

    def test_faces_share_vertices(self):
        """Dedup must produce a connected shell, not triangle soup."""
        vol = sphere_volume(16, 5.0)
        verts, faces, _ = marching_cubes_numpy(vol, 0.0)
        labels, n = split_components(verts, faces)
        assert n == 1


class TestPly:
    def test_roundtrip_binary(self, tmp_path):
        rng = np.random.default_rng(0)
        verts = rng.standard_normal((50, 3))
        faces = rng.integers(0, 50, (30, 3)).astype(np.int64)
        colors = rng.integers(0, 255, (50, 3)).astype(np.uint8)
        p = str(tmp_path / "m.ply")
        write_ply(p, verts, faces, colors=colors)
        v, f, c = read_ply(p)
        np.testing.assert_allclose(v, verts, atol=1e-5)
        np.testing.assert_array_equal(f, faces)
        np.testing.assert_array_equal(c, colors)

    def test_roundtrip_ascii(self, tmp_path):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
        faces = np.array([[0, 1, 2]])
        p = str(tmp_path / "a.ply")
        write_ply(p, verts, faces, binary=False)
        v, f, c = read_ply(p)
        np.testing.assert_allclose(v, verts, atol=1e-5)
        np.testing.assert_array_equal(f, faces)
        assert c is None


class TestComponents:
    def test_filter_small(self):
        # two triangles far apart: big and small
        verts = np.array(
            [
                [0, 0, 0], [10, 0, 0], [0, 10, 0],  # area 50
                [100, 0, 0], [100.1, 0, 0], [100, 0.1, 0],  # area .005
            ]
        )
        faces = np.array([[0, 1, 2], [3, 4, 5]])
        v2, f2 = filter_small_components(verts, faces, min_area=1.0)
        assert len(f2) == 1
        np.testing.assert_allclose(face_areas(v2, f2), [50.0])
