#!/usr/bin/env bash
# Train the registration transformer over extracted NeRF pairs (reference
# scripts/train/train_nerf_regtr.sh:18-27 parity: lr 1e-4, 80 epochs,
# robust correspondence loss).
set -euo pipefail

ROOT_DIR=${1:?usage: train_nerf_regtr.sh <root_dir> [expname]}
EXP=${2:-dreg_nerf}

python train_nerf_regtr.py \
    --dataset objaverse \
    --root_dir "$ROOT_DIR" \
    --expname "$EXP" \
    --lr 1e-4 \
    --epochs 80 \
    --robust_loss \
    --n_validation 2500 \
    --n_checkpoint 5000
