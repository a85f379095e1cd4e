"""Quality gate for the encoder level/width tradeoff.

Trains the hermetic fixture scene with L16/F2 (instant-ngp parity layout),
L8/F4 and L4/F8 packed grids at full table size on the real TPU and prints
val PSNR for each — the evidence for choosing the TPU-default layout.
"""
from __future__ import annotations

import json
import tempfile

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp

from dregnerf_tpu.datasets import fixtures
from dregnerf_tpu.datasets.base import load_scene_blocks
from dregnerf_tpu.models.ngp import NGPConfig, init_ngp
from dregnerf_tpu.ops.packed_grid import PackedGridConfig
from dregnerf_tpu.runtime.config import config_parser
from dregnerf_tpu.runtime.ngp_trainer import NGPTrainer

STEPS = 1500

VARIANTS = {
    "L16_F2": PackedGridConfig(n_levels=16, n_features=2,
               per_level_scale=1.4472692012786865),
    "L8_F4": PackedGridConfig(n_levels=8, n_features=4, per_level_scale=2.1),
    "L4_F8": PackedGridConfig(n_levels=4, n_features=8, per_level_scale=5.66),
}


def main():
    root = tempfile.mkdtemp(prefix="qfix_")
    fixtures.make_scene(root, num_views=36, image_size=128)
    train_scene = load_scene_blocks("objaverse", root, "fixture_scene", "train")[0]
    test_scene = load_scene_blocks("objaverse", root, "fixture_scene", "test")[0]

    for name, gcfg in VARIANTS.items():
        out = tempfile.mkdtemp(prefix=f"qout_{name}_")
        cfg = config_parser([
            "--dataset", "objaverse", "--root_dir", root,
            "--scene", "fixture_scene", "--expname", name, "--out_dir", out,
            "--factor", "1", "--aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0",
            "--max_iterations", str(STEPS),
            "--sample_budget", str(1 << 18),
            "--max_march_steps", "1024",
            "--grid_resolution", "128",
            "--init_num_rays", "4096",
            "--max_num_rays", str(1 << 15),
            "--n_tensorboard", "500",
            "--n_validation", "1000000",
            "--n_checkpoint", "1000000",
        ])
        trainer = NGPTrainer(cfg, train_scene, test_scene)
        trainer.model_config = NGPConfig(grid=gcfg)
        trainer.params = init_ngp(jax.random.PRNGKey(0), trainer.model_config)
        trainer.opt_state = trainer.optimizer.init(trainer.params)
        trainer.state.params = trainer.params
        trainer.state.opt_state = trainer.opt_state
        trainer._step_fns = {}
        trainer.__dict__.pop("_occ_update_fns", None)
        trainer.train()
        psnr = trainer.validate(step=STEPS)
        print(json.dumps({"variant": name, "steps": STEPS,
                          "val_psnr": round(float(psnr), 3)}), flush=True)


if __name__ == "__main__":
    main()
