"""Standalone stage-3 held-out evaluation from the latest reg checkpoint.

Salvage path for the fleet harness: if `stage3_fleet.py` is interrupted
during registration training (RegTrainer checkpoints every
n_checkpoint iterations), this re-creates the trainer, resumes the
latest checkpoint, and runs the identical held-out RRE/RTE evaluation +
FGR side-by-side, writing the same experiments/stage3 artifacts.

Run:  STAGE3_* env as the fleet run, then
      PYTHONPATH=/root/.axon_site:/root/repo python scripts/experiments/stage3_eval_only.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import stage3_fleet as F  # noqa: E402  (reuses config/env + evaluate())


def main():
    from dregnerf_tpu.runtime import reg_trainer as RT
    from dregnerf_tpu.runtime.config import config_parser

    reg_root = os.path.join(F.WORK, "regdata")
    names = F.scene_names()
    train_scenes = names[: F.N_SCENES - F.N_TEST_SCENES]
    test_scenes = names[F.N_SCENES - F.N_TEST_SCENES:]
    train_ds = F.merged_dataset(reg_root, train_scenes, "train", seed=3)
    val_ds = F.merged_dataset(reg_root, test_scenes, "test", seed=4)
    expname = os.environ.get("STAGE3_EXPNAME", "stage3")
    cfg = config_parser([
        "--dataset", "objaverse", "--root_dir", reg_root,
        "--expname", expname, "--out_dir", os.path.join(F.WORK, "regout"),
        "--aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0", "--robust_loss",
        "--epochs", "1", "--lr", "1e-4",
    ])
    trainer = RT.RegTrainer(cfg, train_ds, val_ds)
    trainer.load_checkpoint()
    if trainer.iteration == 0:
        raise SystemExit("no reg checkpoint found — nothing to evaluate")
    print(f"evaluating from reg iteration {trainer.iteration}", flush=True)
    F.REG_ITERS = trainer.iteration  # recorded in metrics_test.json
    F.evaluate(trainer, val_ds, test_scenes)


if __name__ == "__main__":
    main()
