"""COLMAP sparse-model reader (binary + text).

Equivalent of the reference's conerf/utils/colmap_reader.py:85-272 /
sfm_reader.py:53-331 and the vendored pycolmap SceneManager
(conerf/pycolmap/pycolmap/scene_manager.py) for the read paths the
pipeline uses: cameras / images / points3D parsing, pose matrices, and
AABB estimation from point percentiles (scripts/preprocess/
compute_bbox.py:29-59: 2-98% percentiles scaled by 1.4).
"""
from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}


@dataclass
class Camera:
    model: str
    width: int
    height: int
    params: np.ndarray

    @property
    def K(self) -> np.ndarray:
        p = self.params
        if self.model == "SIMPLE_PINHOLE" or self.model.startswith("SIMPLE_RADIAL"):
            f, cx, cy = p[0], p[1], p[2]
            fx = fy = f
        elif self.model == "RADIAL":
            fx = fy = p[0]
            cx, cy = p[1], p[2]
        else:  # PINHOLE / OPENCV family: fx fy cx cy ...
            fx, fy, cx, cy = p[0], p[1], p[2], p[3]
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)


@dataclass
class Image:
    qvec: np.ndarray  # (w, x, y, z)
    tvec: np.ndarray
    camera_id: int
    name: str

    def rotation(self) -> np.ndarray:
        w, x, y, z = self.qvec / np.linalg.norm(self.qvec)
        return np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )

    def world_to_cam(self) -> np.ndarray:
        m = np.eye(4)
        m[:3, :3] = self.rotation()
        m[:3, 3] = self.tvec
        return m

    def cam_to_world(self) -> np.ndarray:
        return np.linalg.inv(self.world_to_cam())


@dataclass
class SparseModel:
    cameras: Dict[int, Camera] = field(default_factory=dict)
    images: Dict[int, Image] = field(default_factory=dict)
    points: Optional[np.ndarray] = None  # [N, 3]
    point_colors: Optional[np.ndarray] = None  # [N, 3] uint8


def _read(f, fmt):
    return struct.unpack(fmt, f.read(struct.calcsize(fmt)))


def read_cameras_bin(path: str) -> Dict[int, Camera]:
    out = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            cam_id, model_id, w, h = _read(f, "<iiQQ")
            name, n_params = CAMERA_MODELS[model_id]
            params = np.array(_read(f, f"<{n_params}d"))
            out[cam_id] = Camera(name, int(w), int(h), params)
    return out


def read_images_bin(path: str) -> Dict[int, Image]:
    out = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            img_id = _read(f, "<i")[0]
            qvec = np.array(_read(f, "<4d"))
            tvec = np.array(_read(f, "<3d"))
            cam_id = _read(f, "<i")[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = _read(f, "<Q")
            f.read(24 * n_pts)  # xys + point3D ids, unused
            out[img_id] = Image(qvec, tvec, cam_id, name.decode())
    return out


def read_points3d_bin(path: str):
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        xyz = np.zeros((n, 3))
        rgb = np.zeros((n, 3), np.uint8)
        for i in range(n):
            _read(f, "<Q")  # id
            xyz[i] = _read(f, "<3d")
            rgb[i] = _read(f, "<3B")
            _read(f, "<d")  # error
            (track_len,) = _read(f, "<Q")
            f.read(8 * track_len)
    return xyz, rgb


def read_cameras_txt(path: str) -> Dict[int, Camera]:
    out = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            cam_id, model = int(parts[0]), parts[1]
            w, h = int(parts[2]), int(parts[3])
            out[cam_id] = Camera(model, w, h, np.array([float(p) for p in parts[4:]]))
    return out


def read_images_txt(path: str) -> Dict[int, Image]:
    out = {}
    with open(path) as f:
        lines = [l for l in f if not l.startswith("#") and l.strip()]
    for i in range(0, len(lines), 2):  # every other line is 2D points
        parts = lines[i].split()
        out[int(parts[0])] = Image(
            np.array([float(p) for p in parts[1:5]]),
            np.array([float(p) for p in parts[5:8]]),
            int(parts[8]), parts[9],
        )
    return out


def read_model(sparse_dir: str) -> SparseModel:
    """Auto-detect binary vs text model in a COLMAP sparse dir."""
    m = SparseModel()
    if os.path.exists(os.path.join(sparse_dir, "cameras.bin")):
        m.cameras = read_cameras_bin(os.path.join(sparse_dir, "cameras.bin"))
        m.images = read_images_bin(os.path.join(sparse_dir, "images.bin"))
        p3d = os.path.join(sparse_dir, "points3D.bin")
        if os.path.exists(p3d):
            m.points, m.point_colors = read_points3d_bin(p3d)
    elif os.path.exists(os.path.join(sparse_dir, "cameras.txt")):
        m.cameras = read_cameras_txt(os.path.join(sparse_dir, "cameras.txt"))
        m.images = read_images_txt(os.path.join(sparse_dir, "images.txt"))
    else:
        raise FileNotFoundError(f"no COLMAP model in {sparse_dir}")
    return m


def compute_aabb_from_points(
    points: np.ndarray, lo_pct: float = 2.0, hi_pct: float = 98.0, scale: float = 1.4
) -> np.ndarray:
    """AABB from point percentiles x scale (compute_bbox.py:29-59)."""
    lo = np.percentile(points, lo_pct, axis=0)
    hi = np.percentile(points, hi_pct, axis=0)
    center = (lo + hi) / 2
    half = (hi - lo) / 2 * scale
    return np.concatenate([center - half, center + half]).astype(np.float32)


def write_cameras_txt(path: str, cameras: Dict[int, Camera]) -> None:
    with open(path, "w") as f:
        f.write("# Camera list: CAMERA_ID MODEL WIDTH HEIGHT PARAMS[]\n")
        for cid, c in sorted(cameras.items()):
            params = " ".join(str(p) for p in c.params)
            f.write(f"{cid} {c.model} {c.width} {c.height} {params}\n")


def write_images_txt(path: str, images: Dict[int, Image]) -> None:
    with open(path, "w") as f:
        f.write("# Image list: IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME\n")
        for iid, im in sorted(images.items()):
            q = " ".join(str(v) for v in im.qvec)
            t = " ".join(str(v) for v in im.tvec)
            f.write(f"{iid} {q} {t} {im.camera_id} {im.name}\n\n")
