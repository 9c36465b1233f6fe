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
