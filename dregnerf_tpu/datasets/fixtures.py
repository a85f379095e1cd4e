"""Synthetic scene fixture generator for tests and smoke training.

Ray-traces a simple analytic scene (two colored spheres) from cameras on a
sphere and writes it in the objaverse on-disk format (transforms.json +
RGBA PNGs) so the full data->train->eval path can run hermetically with no
real Objaverse data in the container.
"""
from __future__ import annotations

import json
import os

import numpy as np


def _look_at(eye: np.ndarray, target: np.ndarray, up: np.ndarray) -> np.ndarray:
    """OpenGL camera-to-world: -z forward, +y up."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -fwd
    c2w[:3, 3] = eye
    return c2w


SPHERES = [
    # (center, radius, albedo)
    (np.array([0.0, 0.0, 0.0]), 0.45, np.array([0.9, 0.25, 0.2])),
    (np.array([0.45, 0.35, -0.2]), 0.22, np.array([0.2, 0.4, 0.95])),
]


def random_spheres(seed: int, n_min: int = 3, n_max: int = 5):
    """Random asymmetric sphere cluster — scene variety for multi-scene
    fleets (stage-3 experiments need >1 object geometry)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(n_min, n_max + 1))
    spheres = [(np.zeros(3), float(rng.uniform(0.3, 0.45)),
                rng.uniform(0.15, 0.95, 3))]
    for _ in range(n - 1):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        spheres.append((
            d * rng.uniform(0.3, 0.55),
            float(rng.uniform(0.1, 0.28)),
            rng.uniform(0.15, 0.95, 3),
        ))
    return spheres


def random_boxes(seed: int, n_min: int = 3, n_max: int = 5):
    """Random axis-aligned box cluster — the second fixture geometry
    family (stage-3 experiments need >=2 shape families so held-out
    generalization is not a single-geometry artifact). Shapes are
    (center, half_extents[3], albedo); _trace dispatches on the
    half-extent being a vector."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(n_min, n_max + 1))
    boxes = [(np.zeros(3), rng.uniform(0.25, 0.45, 3), rng.uniform(0.15, 0.95, 3))]
    for _ in range(n - 1):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        boxes.append((
            d * rng.uniform(0.3, 0.55),
            rng.uniform(0.08, 0.25, 3),
            rng.uniform(0.15, 0.95, 3),
        ))
    return boxes


def _trace(origins: np.ndarray, dirs: np.ndarray, spheres=None) -> np.ndarray:
    """Return [N, 4] RGBA via nearest hit with normal shading.

    Shapes: (center, radius: float, albedo) spheres or
    (center, half_extents: [3], albedo) axis-aligned boxes."""
    n = origins.shape[0]
    best_t = np.full(n, np.inf)
    rgba = np.zeros((n, 4), np.float32)
    light_dir = np.array([0.5, 0.7, 0.5])
    for center, size, albedo in (SPHERES if spheres is None else spheres):
        if np.ndim(size) == 0:  # sphere
            radius = float(size)
            oc = origins - center
            b = np.sum(oc * dirs, axis=-1)
            c = np.sum(oc * oc, axis=-1) - radius**2
            disc = b * b - c
            hit = disc > 0
            t = -b - np.sqrt(np.maximum(disc, 0))
            hit &= (t > 1e-3) & (t < best_t)
            p = origins[hit] + dirs[hit] * t[hit, None]
            normal = (p - center) / radius
        else:  # axis-aligned box (slab method)
            half = np.asarray(size, np.float64)
            inv = 1.0 / np.where(np.abs(dirs) > 1e-12, dirs, 1e-12)
            t0 = (center - half - origins) * inv
            t1 = (center + half - origins) * inv
            tn = np.max(np.minimum(t0, t1), axis=-1)
            tf = np.min(np.maximum(t0, t1), axis=-1)
            hit = (tf > tn) & (tn > 1e-3) & (tn < best_t)
            t = tn
            p = origins[hit] + dirs[hit] * t[hit, None]
            # entry face: the axis whose slab sets tn
            rel = (p - center) / half
            axis = np.argmax(np.abs(rel), axis=-1)
            normal = np.zeros_like(p)
            normal[np.arange(len(p)), axis] = np.sign(
                rel[np.arange(len(p)), axis]
            )
        light = np.clip(normal @ light_dir, 0.1, 1.0)
        rgba[hit, :3] = albedo[None] * (0.35 + 0.65 * light[:, None])
        rgba[hit, 3] = 1.0
        best_t[hit] = t[hit]
    return rgba


def make_scene(
    out_dir: str,
    num_views: int = 30,
    image_size: int = 64,
    camera_distance: float = 3.0,
    fov_x: float = 0.9,
    seed: int = 0,
    name: str = "fixture_scene",
    spheres=None,
) -> str:
    """Write <out_dir>/<name>/{transforms.json, r_*.png}. Returns subject dir."""
    import imageio.v2 as imageio

    subject = os.path.join(out_dir, name)
    os.makedirs(subject, exist_ok=True)
    rng = np.random.default_rng(seed)
    h = w = image_size
    focal = 0.5 * w / np.tan(0.5 * fov_x)

    frames = []
    for i in range(num_views):
        theta = 2 * np.pi * i / num_views
        phi = 0.35 + 0.5 * rng.uniform()  # upper hemisphere
        eye = camera_distance * np.array(
            [np.cos(theta) * np.cos(phi), np.sin(theta) * np.cos(phi), np.sin(phi)]
        )
        c2w = _look_at(eye, np.zeros(3), np.array([0.0, 0.0, 1.0]))

        x, y = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
        dx = (x.ravel() - w / 2 + 0.5) / focal
        dy = -(y.ravel() - h / 2 + 0.5) / focal
        dz = -np.ones_like(dx)
        cam_dirs = np.stack([dx, dy, dz], -1)
        dirs = cam_dirs @ c2w[:3, :3].T
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        origins = np.tile(c2w[:3, 3], (dirs.shape[0], 1))

        rgba = _trace(origins, dirs, spheres).reshape(h, w, 4)
        img = (rgba * 255).astype(np.uint8)
        fname = f"r_{i}"
        imageio.imwrite(os.path.join(subject, fname + ".png"), img)
        frames.append(
            {"file_path": fname, "transform_matrix": c2w.tolist()}
        )

    with open(os.path.join(subject, "transforms.json"), "w") as f:
        json.dump({"camera_angle_x": fov_x, "frames": frames}, f)
    return subject
