"""Train NeRFRegTr on NeRF pairs (stage 3 of the DReg-NeRF pipeline).

CLI parity with the reference train_nerf_regtr.py: trains the registration
transformer over scene pairs drawn from <root_dir>/<dataset>/nerf_models,
with the objaverse.json split (bundled in dregnerf_tpu/datasets/register/).

Usage:
  python train_nerf_regtr.py --dataset objaverse --root_dir <root> \
      --expname dreg --epochs 80 --lr 1e-4 --robust_loss
"""
from __future__ import annotations

from dregnerf_tpu.runtime.config import config_parser, setup_jax


def main() -> None:
    config = config_parser()
    setup_jax(config)

    from dregnerf_tpu.datasets.register_pairs import NeRFRegDataset
    from dregnerf_tpu.runtime.reg_trainer import RegTrainer

    train_dataset = NeRFRegDataset(
        config.root_dir, config.dataset or "objaverse", config.json_dir,
        subject_id=config.scene or None, split="train", seed=config.seed,
    )
    val_dataset = NeRFRegDataset(
        config.root_dir, config.dataset or "objaverse", config.json_dir,
        subject_id=config.scene or None, split="test", seed=config.seed,
    )
    trainer = RegTrainer(config, train_dataset, val_dataset)
    trainer.train()


if __name__ == "__main__":
    main()
