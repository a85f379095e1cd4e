"""Fixture tests for the native-format dataset paths (round 3).

Builds tiny on-disk fixtures in the actual release layouts and loads them:
  * DTU/BlendedMVS: images/ + cams/<name>_cam.txt (+ PFM depth) —
    reference conerf/datasets/mvs.py:208-334.
  * Hypersim: _detail/cam_XX/*.hdf5 + images/scene_cam_XX_final_preview/
    frame.NNNN.tonemap.jpg + metadata_scene.csv —
    reference conerf/datasets/hypersim.py:30-58 helpers / release layout.
"""
from __future__ import annotations

import csv
import math
import os

import numpy as np
import pytest

from dregnerf_tpu.datasets import hypersim, mvs


def _write_png(path, img):
    import imageio.v2 as imageio

    imageio.imwrite(path, img)


def _look_at_w2c(eye):
    """OpenCV-style world-to-camera 4x4 looking at the origin."""
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0.0, 0.0, 1.0])
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd])  # rows = camera axes (OpenCV: x,y,z)
    t = -R @ eye
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = t
    return w2c


class TestMVSNative:
    N = 7
    DEPTH_MIN, DEPTH_MAX = 2.5, 40.0

    def _make_fixture(self, root):
        scene = os.path.join(root, "scan1")
        os.makedirs(os.path.join(scene, "images"))
        os.makedirs(os.path.join(scene, "cams"))
        K = np.array([[100.0, 0, 16], [0, 100.0, 12], [0, 0, 1]])
        w2cs = []
        for i in range(self.N):
            th = 2 * np.pi * i / self.N
            eye = 6.0 * np.array([np.cos(th), np.sin(th), 0.4])
            w2c = _look_at_w2c(eye)
            w2cs.append(w2c)
            img = np.full((24, 32, 3), i * 10, np.uint8)
            _write_png(os.path.join(scene, "images", f"{i:08d}.png"), img)
            lines = ["extrinsic"]
            lines += [" ".join(str(v) for v in row) for row in w2c]
            lines += ["", "intrinsic"]
            lines += [" ".join(str(v) for v in row) for row in K]
            lines += ["", f"{self.DEPTH_MIN} 0.01 {self.DEPTH_MAX}"]
            with open(
                os.path.join(scene, "cams", f"{i:08d}_cam.txt"), "w"
            ) as f:
                f.write("\n".join(lines) + "\n")
        return scene, K, np.stack(w2cs)

    def test_load_and_scale(self, tmp_path):
        root = str(tmp_path)
        scene, K, w2cs = self._make_fixture(root)

        scenes = mvs.load_blocks(root, "scan1", "train")
        assert len(scenes) == 1
        sd = scenes[0]
        # val_interval 30 > N: all frames except idx 0 are train
        assert sd.num_images == self.N - 1
        np.testing.assert_allclose(sd.K, K, rtol=1e-6)

        # scale pinned by the first camera: 5 / depth_min
        s = 5.0 / self.DEPTH_MIN
        assert sd.near == pytest.approx(5.0)
        assert sd.far == pytest.approx(self.DEPTH_MAX * s)
        # c2w = inv(scaled w2c): camera center scales by s
        c2w1 = sd.camtoworlds[0]
        expected_center = np.linalg.inv(w2cs[1])[:3, 3] * s
        np.testing.assert_allclose(c2w1[:3, 3], expected_center, atol=1e-4)

        test = mvs.load_blocks(root, "scan1", "test")[0]
        assert test.num_images == 1  # idx 0 only

    def test_cam_file_parser(self, tmp_path):
        root = str(tmp_path)
        scene, K, w2cs = self._make_fixture(root)
        Ki, ext, dmin, dmax, s = mvs.read_cam_file(
            os.path.join(scene, "cams", "00000000_cam.txt"), None
        )
        np.testing.assert_allclose(Ki, K, rtol=1e-6)
        assert s == pytest.approx(5.0 / self.DEPTH_MIN)
        assert dmin == pytest.approx(5.0)
        np.testing.assert_allclose(ext[:3, :3], w2cs[0][:3, :3], atol=1e-6)
        np.testing.assert_allclose(ext[:3, 3], w2cs[0][:3, 3] * s, atol=1e-5)

    def test_pfm_roundtrip(self, tmp_path):
        depth = np.abs(np.random.default_rng(0).normal(size=(12, 16))).astype(
            np.float32
        )
        path = str(tmp_path / "d.pfm")
        with open(path, "wb") as f:
            f.write(b"Pf\n")
            f.write(b"16 12\n")
            f.write(b"-1.0\n")
            np.flipud(depth).astype("<f4").tofile(f)
        got, scale = mvs.read_pfm(path)
        np.testing.assert_allclose(got, depth, rtol=1e-6)
        assert scale == 1.0


class TestHypersimNative:
    N = 6
    METERS_PER_UNIT = 0.025

    def _make_fixture(self, root):
        h5py = pytest.importorskip("h5py")
        scene = os.path.join(root, "ai_001_001")
        detail = os.path.join(scene, "_detail")
        cam_dir = os.path.join(detail, "cam_00")
        frame_dir = os.path.join(scene, "images", "scene_cam_00_final_preview")
        os.makedirs(cam_dir)
        os.makedirs(frame_dir)

        with open(os.path.join(detail, "metadata_scene.csv"), "w", newline="") as f:
            w = csv.DictWriter(f, ["parameter_name", "parameter_value"])
            w.writeheader()
            w.writerow(
                {
                    "parameter_name": "meters_per_asset_unit",
                    "parameter_value": str(self.METERS_PER_UNIT),
                }
            )

        rng = np.random.default_rng(1)
        positions = rng.normal(size=(self.N, 3)) * 100.0
        orientations = np.zeros((self.N, 3, 3))
        for i in range(self.N):
            q = np.linalg.qr(rng.normal(size=(3, 3)))[0]
            if np.linalg.det(q) < 0:
                q[:, 2] *= -1
            orientations[i] = q
        with h5py.File(
            os.path.join(cam_dir, "camera_keyframe_positions.hdf5"), "w"
        ) as f:
            f.create_dataset("dataset", data=positions)
        with h5py.File(
            os.path.join(cam_dir, "camera_keyframe_orientations.hdf5"), "w"
        ) as f:
            f.create_dataset("dataset", data=orientations)

        for i in range(self.N):
            img = np.full((24, 32, 3), i * 17, np.uint8)
            _write_png(
                os.path.join(frame_dir, f"frame.{i:04d}.tonemap.jpg"), img
            )
        return scene, positions, orientations

    def test_load(self, tmp_path):
        root = str(tmp_path)
        scene, positions, orientations = self._make_fixture(root)

        scenes = hypersim.load_blocks(root, "ai_001_001", "train")
        assert len(scenes) == 1
        sd = scenes[0]
        assert sd.opengl  # native Hypersim orientations are OpenGL-style
        assert sd.num_images == self.N - 1  # idx 0 -> test
        # frame 1 is the first train frame: c2w = [R | p * scale]
        np.testing.assert_allclose(
            sd.camtoworlds[0][:3, :3], orientations[1], atol=1e-6
        )
        np.testing.assert_allclose(
            sd.camtoworlds[0][:3, 3],
            positions[1] * self.METERS_PER_UNIT,
            atol=1e-5,
        )
        # intrinsics from the standard 60-degree horizontal FOV
        fx = 32 / (2 * math.tan(math.pi / 6))
        assert sd.K[0, 0] == pytest.approx(fx)
        assert sd.K[0, 2] == pytest.approx(16.0)

    def test_helpers(self, tmp_path):
        root = str(tmp_path)
        scene, _, _ = self._make_fixture(root)
        assert hypersim._camera_names(os.path.join(scene, "_detail")) == ["cam_00"]
        names, ids = hypersim._tonemap_frames(
            os.path.join(scene, "images", "scene_cam_00_final_preview")
        )
        assert ids == list(range(self.N))
