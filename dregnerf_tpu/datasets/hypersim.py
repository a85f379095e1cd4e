"""Hypersim loader via COLMAP-exported models (conerf/datasets/hypersim.py).

The reference consumes Hypersim scenes after a COLMAP export: sparse model
at `<scene>/sparse/0` with a bbox.txt, images under `images/`; OpenCV
cameras, real data, 160^3 occupancy grids (trainer picks the resolution).
"""
from __future__ import annotations

import os
from typing import List

import numpy as np

from dregnerf_tpu.datasets.base import SceneData, make_blocks
from dregnerf_tpu.datasets.real_world import _load_colmap

OPENGL = False
SYNTHETIC = False


def load_aabb(root: str, subject_id: str):
    p = os.path.join(root, subject_id, "sparse", "0", "bbox.txt")
    if os.path.exists(p):
        return np.loadtxt(p).astype(np.float32)[:6]
    return None


def load_blocks(root, subject_id, split, factor=1, multi_blocks=False, num_blocks=1) -> List[SceneData]:
    images, camtoworlds, K, _ = _load_colmap(root, subject_id, split, factor)
    if multi_blocks:
        return make_blocks(
            os.path.join(root, subject_id), images, camtoworlds, K, split,
            num_blocks, 20, OPENGL, SYNTHETIC, subject_id,
        )
    return [
        SceneData(images=images, camtoworlds=camtoworlds, K=K, opengl=OPENGL,
                  synthetic=SYNTHETIC, subject_id=subject_id, split=split)
    ]
