"""Dataset core: SceneData container, block splitting, world-frame changes.

Capability parity with the reference `DatasetBase`
(conerf/datasets/dataset_base.py:54-304):
  * device-resident uint8 image stacks + [N, 3, 4] camera-to-world poses;
  * synthetic RGBA handling with white/black/random background compositing
    (done inside the jitted train step here — see runtime/ngp_trainer.py);
  * multi-block machinery: KMeans clustering of camera centers into blocks,
    a per-block random SE(3) world-frame change persisted to
    world_frame_transforms.json (same JSON schema as the reference so
    registration GT poses are interchangeable).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class SceneData:
    """One (block of a) scene, host-side."""

    images: np.ndarray  # [N, H, W, C] uint8 (C=4 synthetic, 3 real)
    camtoworlds: np.ndarray  # [N, 3, 4] f32 (possibly world-frame-changed)
    K: np.ndarray  # [3, 3] f32
    opengl: bool
    synthetic: bool  # RGBA alpha-composited over background color
    subject_id: str = ""
    split: str = "train"
    block_id: Optional[int] = None
    near: float = 0.0
    far: float = 1e10

    @property
    def num_images(self) -> int:
        return self.images.shape[0]

    @property
    def height(self) -> int:
        return self.images.shape[1]

    @property
    def width(self) -> int:
        return self.images.shape[2]


def random_se3_np(rng: np.random.Generator, trans_clamp: float = 0.2) -> np.ndarray:
    """Random 4x4 world-frame change: uniform-ish rotation + clamped
    translation (reference pose_util.py:363-368 random_SE3)."""
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    rot = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    t = np.clip(rng.normal(size=3) * trans_clamp, -trans_clamp, trans_clamp)
    out = np.eye(4)
    out[:3, :3] = rot
    out[:3, 3] = t
    return out


def read_world_frame_transforms(data_dir: str) -> Optional[Dict[int, np.ndarray]]:
    """world_frame_transforms.json: {block_id: 4x4} (dataset_base.py:22-38)."""
    path = os.path.join(data_dir, "world_frame_transforms.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    out = {int(k): np.asarray(v, np.float32) for k, v in data.items()}
    assert out, f"Invalid transformation file: {path}"
    return out


def save_world_frame_transforms(data_dir: str, transforms: Dict[int, np.ndarray]) -> None:
    path = os.path.join(data_dir, "world_frame_transforms.json")
    data = {str(k): np.asarray(v).tolist() for k, v in transforms.items()}
    with open(path, "w") as f:
        f.write(json.dumps(data, indent=4))


def cluster_cameras(camtoworlds: np.ndarray, num_clusters: int, method: str = "KMeans") -> np.ndarray:
    """Cluster camera centers into blocks (conerf/register/cluster.py:7-33)."""
    centers = camtoworlds[:, :3, 3]
    if method == "KMeans":
        from sklearn.cluster import KMeans

        return KMeans(n_clusters=num_clusters, n_init=10, random_state=0).fit_predict(
            centers
        )
    if method == "Spectral":
        from sklearn.cluster import SpectralClustering

        return SpectralClustering(
            n_clusters=num_clusters, random_state=0, assign_labels="discretize"
        ).fit_predict(centers)
    raise ValueError(f"unknown clustering method: {method}")


def split_indices(n: int, split: str, val_interval: int) -> np.ndarray:
    idx = np.arange(n)
    if split == "test":
        return idx[idx % val_interval == 0]
    return idx[idx % val_interval != 0]


def apply_world_frame(c2w: np.ndarray, se3: np.ndarray) -> np.ndarray:
    """Left-multiply 4x4 SE3 onto [N, 3, 4] (or [N, 4, 4]) poses."""
    homo = np.concatenate(
        [c2w[:, :3, :4], np.tile(np.array([[[0, 0, 0, 1.0]]]), (c2w.shape[0], 1, 1))],
        axis=1,
    )
    return (se3[None] @ homo)[:, :3, :4].astype(np.float32)


def make_blocks(
    data_dir: str,
    images: np.ndarray,
    camtoworlds: np.ndarray,
    K: np.ndarray,
    split: str,
    num_blocks: int,
    val_interval: int,
    opengl: bool,
    synthetic: bool,
    subject_id: str,
    seed: int = 0,
    near: float = 0.0,
    far: float = 1e10,
) -> List[SceneData]:
    """Cluster into blocks, apply (and persist) per-block world-frame changes,
    then carve the train/test split inside each block."""
    labels = cluster_cameras(camtoworlds, num_blocks)
    transforms = read_world_frame_transforms(data_dir)
    fresh = transforms is None
    if fresh:
        rng = np.random.default_rng(seed)
        transforms = {}

    blocks = []
    for block_id in sorted(set(int(l) for l in labels)):
        ids = np.sort(np.where(labels == block_id)[0])
        sel = split_indices(len(ids), split, val_interval)
        ids_split = ids[sel]
        if fresh:
            transforms[block_id] = random_se3_np(rng)
        c2w = apply_world_frame(camtoworlds[ids_split], transforms[block_id])
        blocks.append(
            SceneData(
                images=images[ids_split],
                camtoworlds=c2w,
                K=K,
                opengl=opengl,
                synthetic=synthetic,
                subject_id=subject_id,
                split=split,
                block_id=block_id,
                near=near,
                far=far,
            )
        )
    if fresh:
        save_world_frame_transforms(data_dir, transforms)
    return blocks


# CLI name (reference conerf/utils/config.py:24-31 choices, plus aliases)
# -> loader module under dregnerf_tpu.datasets.
DATASET_MODULES: Dict[str, str] = {
    "objaverse": "objaverse",
    "nerf_synthetic": "nerf_synthetic",
    "blender": "nerf_synthetic",
    "Synthetic_NSVF": "nsvf",
    "nsvf": "nsvf",
    "scannerf": "scannerf",
    "dtu": "mvs",
    "BlendedMVS": "mvs",
    "blendedmvs": "mvs",
    "mvs": "mvs",
    "nerf_llff_data": "real_world",
    "llff": "real_world",
    "mipnerf_360": "real_world",
    "mipnerf360": "real_world",
    "real_world": "real_world",
    "Hypersim": "hypersim",
    "hypersim": "hypersim",
    "dnerf": "dnerf_synthetic",
}


def dataset_module(dataset: str):
    """Resolve a CLI --dataset value (or alias) to its loader module."""
    try:
        name = DATASET_MODULES[dataset]
    except KeyError:
        raise ValueError(
            f"unknown dataset: {dataset!r} (known: {sorted(DATASET_MODULES)})"
        ) from None
    import importlib

    return importlib.import_module(f"dregnerf_tpu.datasets.{name}")


def load_scene_blocks(
    dataset: str,
    root: str,
    subject_id: str,
    split: str,
    factor: int = 1,
    multi_blocks: bool = False,
    num_blocks: int = 1,
) -> List[SceneData]:
    """Dispatch to a format loader; returns one SceneData per block
    (a single-element list when multi_blocks=False)."""
    return dataset_module(dataset).load_blocks(
        root, subject_id, split, factor, multi_blocks, num_blocks
    )
