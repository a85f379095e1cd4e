"""Train per-block Instant-NGP NeRFs (stage 1 of the DReg-NeRF pipeline).

CLI parity with the reference train_ngp_nerf.py: trains one NeRF per scene
block; with --multi_blocks it splits the scene into a random number of
blocks in [min_num_blocks, max_num_blocks], applies per-block random
world-frame changes (persisted to world_frame_transforms.json), and trains
each block (reference train_ngp_nerf.py:406-472).

Usage:
  python train_ngp_nerf.py --dataset objaverse --root_dir <root> \
      --scene <subject> --expname <name> --multi_blocks --max_iterations 10000
"""
from __future__ import annotations

import copy
import os
import random
import sys

from dregnerf_tpu.runtime.config import config_parser, setup_jax


def train(config) -> None:
    from dregnerf_tpu.datasets.base import load_scene_blocks
    from dregnerf_tpu.runtime.ngp_trainer import NGPTrainer

    if config.multi_blocks:
        num_blocks = random.randint(config.min_num_blocks, config.max_num_blocks)
        train_blocks = load_scene_blocks(
            config.dataset, config.root_dir, config.scene, "train",
            config.factor, True, num_blocks,
        )
        test_blocks = load_scene_blocks(
            config.dataset, config.root_dir, config.scene, "test",
            config.factor, True, num_blocks,
        )
        if getattr(config, "fleet", False):
            # one sharded program trains ALL blocks concurrently, one block
            # per device (runtime/fleet_trainer.py; zero collectives)
            from dregnerf_tpu.runtime.fleet_trainer import FleetNGPTrainer

            out_dirs = [
                os.path.join(config.out_dir, config.expname, f"block_{k}")
                for k in range(len(train_blocks))
            ]
            print(f"=== fleet-training {len(train_blocks)} blocks ===")
            FleetNGPTrainer(config, train_blocks, test_blocks, out_dirs).train()
            return
        for k, (train_scene, test_scene) in enumerate(zip(train_blocks, test_blocks)):
            out_dir = os.path.join(config.out_dir, config.expname, f"block_{k}")
            print(f"=== training block {k}: {train_scene.num_images} images ===")
            trainer = NGPTrainer(config, train_scene, test_scene, output_dir=out_dir)
            trainer.train()
    else:
        train_scene = load_scene_blocks(
            config.dataset, config.root_dir, config.scene, "train", config.factor
        )[0]
        test_scene = load_scene_blocks(
            config.dataset, config.root_dir, config.scene, "test", config.factor
        )[0]
        trainer = NGPTrainer(config, train_scene, test_scene)
        trainer.train()


def main() -> None:
    config = config_parser()
    setup_jax(config)

    scenes = [s for s in config.scene.split(",") if s] or [""]
    for scene in scenes:
        cfg = copy.deepcopy(config)
        cfg.scene = scene
        if len(scenes) > 1:
            cfg.expname = scene
        scene_dir = os.path.join(cfg.root_dir, scene)
        if scene and not os.path.isdir(scene_dir):
            print(f"skipping missing scene dir: {scene_dir}")
            continue
        train(cfg)


if __name__ == "__main__":
    main()
