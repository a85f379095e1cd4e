"""D-NeRF synthetic loader: time-conditioned blender scenes.

Format parity with conerf/datasets/dnerf_synthetic.py:16-100:
`transforms_{split}.json` whose frames carry a `time` value in [0, 1];
OpenGL cameras, synthetic RGBA, NEAR/FAR 2/6. The per-frame timestamps
ride along in `SceneData` via the `timestamps` attribute consumed by the
D-NeRF field (models/mlp_nerf.py warp).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional

import imageio.v2 as imageio
import numpy as np

from dregnerf_tpu.datasets.base import SceneData

OPENGL = True
SYNTHETIC = True
NEAR, FAR = 2.0, 6.0


@dataclasses.dataclass
class DNeRFSceneData(SceneData):
    timestamps: Optional[np.ndarray] = None  # [N] in [0, 1]


def _load_renderings(root: str, subject_id: str, split: str, factor: int = 1):
    data_dir = os.path.join(root, subject_id)
    with open(os.path.join(data_dir, f"transforms_{split}.json")) as f:
        meta = json.load(f)
    images, camtoworlds, times = [], [], []
    for frame in meta["frames"]:
        images.append(imageio.imread(os.path.join(data_dir, frame["file_path"] + ".png")))
        camtoworlds.append(np.asarray(frame["transform_matrix"], np.float32))
        times.append(float(frame.get("time", 0.0)))
    images = np.stack(images)
    camtoworlds = np.stack(camtoworlds)[:, :3, :4]
    if factor > 1:
        images = images[:, ::factor, ::factor]
    h, w = images.shape[1:3]
    focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32)
    return images, camtoworlds, K, np.asarray(times, np.float32)


def load_blocks(root, subject_id, split, factor=1, multi_blocks=False, num_blocks=1) -> List[SceneData]:
    images, camtoworlds, K, times = _load_renderings(root, subject_id, split, factor)
    return [
        DNeRFSceneData(
            images=images, camtoworlds=camtoworlds, K=K, opengl=OPENGL,
            synthetic=SYNTHETIC, subject_id=subject_id, split=split,
            near=NEAR, far=FAR, timestamps=times,
        )
    ]
