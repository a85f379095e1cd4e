"""Objaverse loader: Blender-rendered scenes with a single transforms.json.

Format parity with the reference (conerf/datasets/objaverse.py:15-98):
`<root>/<subject_id>/transforms.json` with `camera_angle_x` + frames of
`{file_path, transform_matrix}`; RGBA PNGs at `file_path + ".png"`;
val_interval 20 re-split regardless of requested split name; OpenGL camera,
synthetic RGBA compositing.
"""
from __future__ import annotations

import json
import os
from typing import List

import imageio.v2 as imageio
import numpy as np

from dregnerf_tpu.datasets.base import (
    SceneData,
    make_blocks,
    split_indices,
)

VAL_INTERVAL = 20
OPENGL = True
SYNTHETIC = True


def _load_renderings(root: str, subject_id: str, factor: int = 1):
    data_dir = os.path.join(root, subject_id)
    with open(os.path.join(data_dir, "transforms.json")) as f:
        meta = json.load(f)
    images, camtoworlds = [], []
    for frame in meta["frames"]:
        fname = os.path.join(data_dir, frame["file_path"] + ".png")
        images.append(imageio.imread(fname))
        camtoworlds.append(np.asarray(frame["transform_matrix"], np.float32))
    images = np.stack(images)
    camtoworlds = np.stack(camtoworlds)[:, :3, :4]
    if factor > 1:
        images = images[:, ::factor, ::factor]
    h, w = images.shape[1:3]
    focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32)
    return images, camtoworlds, K


def load_blocks(
    root: str,
    subject_id: str,
    split: str,
    factor: int = 1,
    multi_blocks: bool = False,
    num_blocks: int = 1,
) -> List[SceneData]:
    images, camtoworlds, K = _load_renderings(root, subject_id, factor)
    data_dir = os.path.join(root, subject_id)
    if multi_blocks:
        return make_blocks(
            data_dir, images, camtoworlds, K, split, num_blocks, VAL_INTERVAL,
            OPENGL, SYNTHETIC, subject_id,
        )
    sel = split_indices(images.shape[0], split, VAL_INTERVAL)
    return [
        SceneData(
            images=images[sel],
            camtoworlds=camtoworlds[sel],
            K=K,
            opengl=OPENGL,
            synthetic=SYNTHETIC,
            subject_id=subject_id,
            split=split,
        )
    ]
