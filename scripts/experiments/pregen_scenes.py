"""Pre-generate fleet scene data on CPU (overlaps the TPU pipeline).

stage1_and_2 generates each scene's views serially before training it
(~1.5-2 min/scene of pure CPU raytracing); running this beside a TPU job
removes that from the fleet's critical path. Scene indices and seeds
match stage3_fleet.scene_shapes exactly — stage1 will find
transforms.json and skip generation.

Run: PYTHONPATH=/root/repo nice -n 19 python scripts/experiments/pregen_scenes.py <lo> <hi>
"""
from __future__ import annotations

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from stage3_fleet import IMG_SIZE, N_VIEWS, WORK, scene_shapes  # noqa: E402

from dregnerf_tpu.datasets import fixtures  # noqa: E402


def main(lo: int, hi: int) -> None:
    data_root = os.path.join(WORK, "data")
    for s_idx in range(lo, hi):
        scene = f"scene_{s_idx:02d}"
        if os.path.exists(os.path.join(data_root, scene, "transforms.json")):
            print(f"[pregen] {scene}: exists", flush=True)
            continue
        t0 = time.time()
        fixtures.make_scene(
            data_root, num_views=N_VIEWS, image_size=IMG_SIZE,
            seed=s_idx, name=scene, spheres=scene_shapes(s_idx),
        )
        print(f"[pregen] {scene}: {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
