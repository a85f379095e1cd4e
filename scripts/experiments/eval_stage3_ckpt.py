"""Standalone held-out eval from an existing stage-3 checkpoint.

Insurance for the round-end crunch: if the fleet process is cut (round
end, tunnel wedge, VM restart) after stage-3 training has checkpointed
but BEFORE its in-process evaluate() ran, this script reproduces the
exact same metrics_test.json / fgr_metrics_test.json from the latest (or
best) checkpoint on disk — without retraining anything.

Reference parity: the reference evaluates a trained registrar from its
checkpoint in a separate process too (eval_nerf_regtr.py loads
model_best.pth and iterates the test split); this is the same shape, on
the fleet's layout.

Run AFTER the fleet process is stopped (one TPU process at a time):
  PYTHONPATH=/root/.axon_site:/root/repo \
      python scripts/experiments/eval_stage3_ckpt.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import stage3_fleet as F  # noqa: E402  (shares scale constants + evaluate)
from dregnerf_tpu.runtime import reg_trainer as RT  # noqa: E402
from dregnerf_tpu.runtime.config import config_parser  # noqa: E402


def main() -> int:
    reg_root = os.path.join(F.WORK, "regdata")
    names = F.scene_names()
    train_scenes = names[: F.N_SCENES - F.N_TEST_SCENES]
    test_scenes = names[F.N_SCENES - F.N_TEST_SCENES:]
    train_ds = F.merged_dataset(reg_root, train_scenes, "train", seed=3)
    val_ds = F.merged_dataset(reg_root, test_scenes, "test", seed=4)

    # identical config to stage3() so ckpt_manager resolves the fleet's
    # checkpoint directory (WORK/regout/stage3)
    epochs = max(1, F.REG_ITERS // len(train_ds))
    cfg = config_parser([
        "--dataset", "objaverse", "--root_dir", reg_root,
        # honor STAGE3_EXPNAME like stage3_fleet/stage3_eval_only do — a
        # hardcoded "stage3" would silently load a STALE prior-run ckpt
        # after an extended (stage3b/...) fleet (ADVICE r4)
        "--expname", os.environ.get("STAGE3_EXPNAME", "stage3"),
        "--out_dir", os.path.join(F.WORK, "regout"),
        "--aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0", "--robust_loss",
        "--epochs", str(epochs),
        "--n_tensorboard", "100", "--n_validation", "500",
        "--n_checkpoint", "1000", "--lr", "1e-4",
        "--val_fraction", "1.0",
    ])
    trainer = RT.RegTrainer(cfg, train_ds, val_ds)
    trainer.load_checkpoint()
    if trainer.iteration == 0:
        print("[eval_stage3_ckpt] no stage-3 checkpoint found under "
              f"{os.path.join(F.WORK, 'regout')} — nothing to evaluate",
              flush=True)
        return 1
    print(f"[eval_stage3_ckpt] latest checkpoint at iteration "
          f"{trainer.iteration}; evaluate() prefers model_best if present",
          flush=True)
    F.evaluate(trainer, val_ds, test_scenes)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
