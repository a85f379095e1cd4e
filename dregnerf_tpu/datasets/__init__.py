"""Dataset loaders.

`load_scene(dataset, root, subject, split, ...)` dispatches to per-format
loaders covering the reference's 8 image datasets (SURVEY.md §2 #21) plus
the NeRF-pair registration dataset. Loaders return host-side `SceneData`;
the trainer ships image stacks to device once and generates rays on-device.
"""
from dregnerf_tpu.datasets.base import SceneData, load_scene_blocks  # noqa: F401
