"""Dataset loader tests with generated on-disk fixtures (no downloads).

Covers the format/convention handling of the Replica, ScanNet, and TUM-RGBD
loaders (ref: src/utils/datasets.py): BGR->RGB, png depth scaling, the
OpenCV->OpenGL y/z axis flip, crop_edge, and TUM timestamp association.
"""

import os

import cv2
import numpy as np
import pytest

from attentive_dfprior_tpu.utils.datasets import Replica, ScanNet, TUM_RGBD, get_dataset


def base_cfg(input_folder, dataset, H=8, W=10, depth_scale=1000.0, crop_edge=0):
    return {
        "dataset": dataset,
        "cam": {
            "H": H,
            "W": W,
            "fx": 10.0,
            "fy": 10.0,
            "cx": 4.5,
            "cy": 3.5,
            "png_depth_scale": depth_scale,
            "crop_edge": crop_edge,
        },
        "data": {"input_folder": str(input_folder)},
    }


def write_frame(color_path, depth_path, H=8, W=10, depth_m=1.5, scale=1000.0):
    bgr = np.zeros((H, W, 3), np.uint8)
    bgr[..., 0] = 200  # blue channel (BGR) -> should land in RGB[...,2]
    bgr[..., 2] = 50  # red channel -> RGB[...,0]
    cv2.imwrite(str(color_path), bgr)
    depth = np.full((H, W), depth_m * scale, np.uint16)
    cv2.imwrite(str(depth_path), depth)


class TestReplica:
    def test_load_and_conventions(self, tmp_path):
        res = tmp_path / "results"
        res.mkdir()
        for i in range(3):
            write_frame(res / f"frame{i:06d}.jpg", res / f"depth{i:06d}.png")
        pose = np.eye(4)
        pose[:3, 3] = [1.0, 2.0, 3.0]
        with open(tmp_path / "traj.txt", "w") as f:
            for _ in range(3):
                f.write(" ".join(str(v) for v in pose.reshape(-1)) + "\n")

        cfg = base_cfg(tmp_path, "replica", depth_scale=1000.0)
        ds = get_dataset(cfg)
        assert isinstance(ds, Replica)
        assert len(ds) == 3
        idx, color, depth, c2w = ds[0]
        assert color.shape == (8, 10, 3) and depth.shape == (8, 10)
        # BGR->RGB: red channel ~50/255, blue ~200/255 (jpg lossy -> loose tol)
        assert abs(color[0, 0, 0] - 50 / 255) < 0.15
        assert abs(color[0, 0, 2] - 200 / 255) < 0.15
        np.testing.assert_allclose(depth, 1.5, atol=1e-3)
        # identity rotation y/z-flipped on load (OpenCV -> OpenGL)
        np.testing.assert_allclose(np.diag(c2w), [1, -1, -1, 1], atol=1e-6)
        np.testing.assert_allclose(c2w[:3, 3], [1, 2, 3], atol=1e-6)

    def test_crop_edge(self, tmp_path):
        res = tmp_path / "results"
        res.mkdir()
        write_frame(res / "frame000000.jpg", res / "depth000000.png")
        with open(tmp_path / "traj.txt", "w") as f:
            f.write(" ".join(str(v) for v in np.eye(4).reshape(-1)) + "\n")
        cfg = base_cfg(tmp_path, "replica", crop_edge=1)
        ds = get_dataset(cfg)
        _, color, depth, _ = ds[0]
        assert color.shape == (6, 8, 3) and depth.shape == (6, 8)


class TestScanNet:
    def test_load(self, tmp_path):
        frames = tmp_path / "frames"
        for sub in ("color", "depth", "pose"):
            (frames / sub).mkdir(parents=True)
        for i in range(2):
            write_frame(frames / "color" / f"{i}.jpg", frames / "depth" / f"{i}.png")
            with open(frames / "pose" / f"{i}.txt", "w") as f:
                for row in np.eye(4):
                    f.write(" ".join(str(v) for v in row) + "\n")
        cfg = base_cfg(tmp_path, "scannet")
        ds = get_dataset(cfg)
        assert isinstance(ds, ScanNet)
        assert len(ds) == 2
        _, color, depth, c2w = ds[1]
        np.testing.assert_allclose(np.diag(c2w), [1, -1, -1, 1], atol=1e-6)


class TestTUM:
    def test_association_and_relative_poses(self, tmp_path):
        (tmp_path / "rgb").mkdir()
        (tmp_path / "depth").mkdir()
        stamps = [0.0, 0.5, 1.0]
        with open(tmp_path / "rgb.txt", "w") as frgb, open(
            tmp_path / "depth.txt", "w"
        ) as fd:
            for t in stamps:
                write_frame(
                    tmp_path / "rgb" / f"{t:.1f}.png",
                    tmp_path / "depth" / f"{t:.1f}.png",
                )
                frgb.write(f"{t} rgb/{t:.1f}.png\n")
                fd.write(f"{t + 0.01} depth/{t:.1f}.png\n")
        with open(tmp_path / "groundtruth.txt", "w") as f:
            f.write("# header\n")
            for i, t in enumerate(stamps):
                # tx ty tz qx qy qz qw (identity rotation)
                f.write(f"{t + 0.005} {i} 0 0 0 0 0 1\n")

        cfg = base_cfg(tmp_path, "tumrgbd")
        ds = get_dataset(cfg)
        assert isinstance(ds, TUM_RGBD)
        assert len(ds) >= 2
        _, _, _, c2w0 = ds[0]
        # first pose normalized to (flipped) identity
        np.testing.assert_allclose(np.diag(c2w0), [1, -1, -1, 1], atol=1e-6)
        np.testing.assert_allclose(c2w0[:3, 3], 0, atol=1e-6)
        _, _, _, c2w1 = ds[1]
        # relative translation preserved (1 unit along x)
        assert abs(c2w1[0, 3] - 1.0) < 1e-5


class TestCropSizeResize:
    """crop_size must follow the reference's torch semantics — color via
    F.interpolate(align_corners=True), depth via torch 'nearest'
    (ref: src/utils/datasets.py:96-103) — which differ from cv2.resize's
    half-pixel mapping."""

    @pytest.mark.parametrize("shape,out", [((8, 10), (5, 7)), ((7, 9), (12, 14))])
    def test_bilinear_matches_torch_align_corners(self, shape, out):
        import torch
        import torch.nn.functional as F

        from attentive_dfprior_tpu.utils.datasets import (
            _resize_bilinear_align_corners,
        )

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, shape + (3,)).astype(np.float64)
        ours = _resize_bilinear_align_corners(img, out)
        ref = F.interpolate(
            torch.from_numpy(img).permute(2, 0, 1)[None],
            out, mode="bilinear", align_corners=True,
        )[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)

    @pytest.mark.parametrize("shape,out", [((8, 10), (5, 7)), ((6, 6), (9, 4))])
    def test_nearest_matches_torch(self, shape, out):
        import torch
        import torch.nn.functional as F

        from attentive_dfprior_tpu.utils.datasets import _resize_nearest_torch

        rng = np.random.default_rng(1)
        img = rng.uniform(0, 4, shape).astype(np.float32)
        ours = _resize_nearest_torch(img, out)
        ref = F.interpolate(
            torch.from_numpy(img)[None, None], out, mode="nearest"
        )[0, 0].numpy()
        np.testing.assert_array_equal(ours, ref)

    def test_crop_size_in_loader(self, tmp_path):
        """End-to-end: a ScanNet-style config with crop_size resizes both
        maps with the torch mapping before crop_edge."""
        import torch
        import torch.nn.functional as F

        folder = tmp_path / "scene" / "frames"
        (folder / "color").mkdir(parents=True)
        (folder / "depth").mkdir()
        (folder / "pose").mkdir()
        H, W = 12, 16
        rng = np.random.default_rng(2)
        bgr = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(folder / "color" / "0.jpg"), bgr)
        depth = rng.integers(500, 3000, (H, W)).astype(np.uint16)
        cv2.imwrite(str(folder / "depth" / "0.png"), depth)
        np.savetxt(str(folder / "pose" / "0.txt"), np.eye(4))

        cfg = base_cfg(tmp_path / "scene", "scannet", H=H, W=W)
        cfg["cam"]["crop_size"] = [8, 11]
        ds = ScanNet(cfg)
        idx, color, d, pose = ds[0]
        assert color.shape == (8, 11, 3) and d.shape == (8, 11)
        dm = depth.astype(np.float32) / 1000.0
        ref_d = F.interpolate(
            torch.from_numpy(dm)[None, None], (8, 11), mode="nearest"
        )[0, 0].numpy()
        np.testing.assert_allclose(d, ref_d, rtol=1e-6)


class TestAzure:
    def test_trajectory_log_poses(self, tmp_path):
        """Azure reads 5-line blocks from scene/trajectory.log
        (ref: src/utils/datasets.py:158-176)."""
        from attentive_dfprior_tpu.utils.datasets import Azure

        (tmp_path / "color").mkdir()
        (tmp_path / "depth").mkdir()
        (tmp_path / "scene").mkdir()
        H, W = 8, 10
        mats = []
        lines = []
        rng = np.random.default_rng(3)
        for i in range(2):
            write_frame(
                tmp_path / "color" / f"{i:05d}.jpg",
                tmp_path / "depth" / f"{i:05d}.png", H=H, W=W,
            )
            m = np.eye(4)
            m[:3, 3] = rng.uniform(-1, 1, 3)
            mats.append(m)
            lines.append(f"{i} {i} {i+1}\n")
            for r in range(4):
                lines.append(" ".join(f"{v:.17g}" for v in m[r]) + "\n")
        (tmp_path / "scene" / "trajectory.log").write_text("".join(lines))

        ds = Azure(base_cfg(tmp_path, "azure", H=H, W=W))
        assert len(ds) == 2
        for i in range(2):
            _, color, depth, pose = ds[i]
            expect = mats[i].copy()
            expect[:3, 1] *= -1
            expect[:3, 2] *= -1
            np.testing.assert_allclose(pose, expect, atol=1e-7)
            assert color.shape == (H, W, 3)

    def test_missing_trajectory_gives_identity(self, tmp_path):
        from attentive_dfprior_tpu.utils.datasets import Azure

        (tmp_path / "color").mkdir()
        (tmp_path / "depth").mkdir()
        write_frame(tmp_path / "color" / "0.jpg", tmp_path / "depth" / "0.png")
        ds = Azure(base_cfg(tmp_path, "azure"))
        np.testing.assert_array_equal(ds.poses[0], np.eye(4, dtype=np.float32))


class TestCoFusion:
    def test_exr_depth_and_identity_poses(self, tmp_path, monkeypatch):
        """CoFusion reads colour/*.png + depth_noise/*.exr with identity
        poses (ref: src/utils/datasets.py:211-231). The EXR reader needs
        OpenEXR (absent here), so it is patched with a raw-float stub —
        the test covers the loader's glob/scale/convention plumbing."""
        import attentive_dfprior_tpu.utils.datasets as D

        (tmp_path / "colour").mkdir()
        (tmp_path / "depth_noise").mkdir()
        H, W = 8, 10
        bgr = np.zeros((H, W, 3), np.uint8)
        bgr[..., 2] = 77
        cv2.imwrite(str(tmp_path / "colour" / "Color0001.png"), bgr)
        depth = np.full((H, W), 1.25, np.float32)
        (tmp_path / "depth_noise" / "Depth0001.exr").write_bytes(
            depth.tobytes()
        )

        def fake_exr(path):
            return np.frombuffer(
                open(path, "rb").read(), np.float32
            ).reshape(H, W)

        monkeypatch.setattr(D, "_read_exr_depth", fake_exr)
        cfg = base_cfg(tmp_path, "cofusion", H=H, W=W, depth_scale=1.0)
        ds = D.CoFusion(cfg)
        assert len(ds) == 1
        _, color, d, pose = ds[0]
        np.testing.assert_allclose(d, 1.25, rtol=1e-6)
        assert abs(color[0, 0, 0] - 77 / 255.0) < 0.02  # red->RGB[...,0]
        np.testing.assert_array_equal(pose, np.eye(4, dtype=np.float32))
