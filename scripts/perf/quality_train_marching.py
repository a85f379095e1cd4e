"""Training-marcher quality/speed gate at REAL config scale.

Round-1's fixture showed rows-mode K-per-ray truncation hurts training at
tiny K (8-32). At the real config (2^18 budget, dynamic rays ~4-16k,
K = budget/rays = 16-64) the question is open — measure it: train the
fixture scene with (a) compact span-1.5 (current default), (b) compact
span-3.5 (half the region gathers, conservative extra samples), (c) rows.
Report s/step and val PSNR; the winner becomes the trainer default.
"""
from __future__ import annotations

import dataclasses
import json
import tempfile
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from dregnerf_tpu.datasets import fixtures
from dregnerf_tpu.datasets.base import load_scene_blocks
from dregnerf_tpu.runtime.config import config_parser
from dregnerf_tpu.runtime.ngp_trainer import NGPTrainer

STEPS = 1500


def main():
    root = tempfile.mkdtemp(prefix="qtm_")
    fixtures.make_scene(root, num_views=36, image_size=128)
    train_scene = load_scene_blocks("objaverse", root, "fixture_scene", "train")[0]
    test_scene = load_scene_blocks("objaverse", root, "fixture_scene", "test")[0]

    import os

    variants = [("compact", "compact", "f32"), ("rows", "rows", "f32"),
                ("capped", "capped", "f32"),
                ("capped_bf16grad", "capped", "bf16"),
                ("capped512_bf16grad", "capped", "bf16"),
                ("compact_bf16grad", "compact", "bf16")]
    only = os.environ.get("QTM_VARIANTS", "")
    if only:
        sel = set(only.split(","))
        variants = [v for v in variants if v[0] in sel]
    for name, mode, accum in variants:
        out = tempfile.mkdtemp(prefix=f"qtm_{name}_")
        cfg = config_parser([
            "--dataset", "objaverse", "--root_dir", root,
            "--scene", "fixture_scene", "--expname", name, "--out_dir", out,
            "--factor", "1", "--aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0",
            "--max_iterations", str(STEPS),
            "--sample_budget", str(1 << 18),
            "--max_march_steps", "1024",
            "--grid_resolution", "128",
            "--init_num_rays", "4096",
            # both variants settle at 16384 rays; capping there avoids a
            # throwaway 32768-bucket compile (one such compile coincided
            # with a wedged compile tunnel in round 3)
            "--max_num_rays", str(1 << 14),
            "--n_tensorboard", "500",
            "--n_validation", "1000000",
            "--n_checkpoint", "1000000",
        ])
        trainer = NGPTrainer(cfg, train_scene, test_scene)
        trainer.render_config = dataclasses.replace(
            trainer.render_config, march_compaction=mode,
            k_cap=512 if "512" in name else 256,
        )
        if accum != "f32":
            from dregnerf_tpu.models.ngp import NGPConfig, init_ngp
            from dregnerf_tpu.ops.packed_grid import PackedGridConfig

            trainer.model_config = NGPConfig(
                grid=PackedGridConfig(grad_accum=accum)
            )
            # param VALUES unchanged (same init key/config geometry)
            trainer.params = init_ngp(jax.random.PRNGKey(cfg.seed),
                                      trainer.model_config)
            trainer.opt_state = trainer.optimizer.init(trainer.params)
            trainer.state.params = trainer.params
            trainer.state.opt_state = trainer.opt_state
            trainer._step_fns = {}
            trainer.__dict__.pop("_occ_update_fns", None)
        # drive train_iteration directly (the trainer.train() wrapper hung
        # twice through the axon tunnel at ~step 500 in capped mode while
        # this direct loop trains the same config fine — /tmp repro r3)
        t0 = time.time()
        key = jax.random.PRNGKey(cfg.seed)
        for step in range(STEPS):
            trainer.train_iteration(step, key)
            if step % 100 == 0:
                print(f"  [{name}] step {step} ({time.time() - t0:.0f}s)",
                      flush=True)
        train_s = time.time() - t0
        psnr = trainer.validate(step=STEPS)
        print(json.dumps({
            "variant": name, "steps": STEPS,
            "s_per_step": round(train_s / STEPS, 4),
            "val_psnr": round(float(psnr), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
