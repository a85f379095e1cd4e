#!/usr/bin/env bash
# Train per-block NGP NeRFs for a batch of Objaverse scenes (reference
# scripts/train/train_objaverse_batch.sh parity). One python process per
# scene list; scale out by running one instance per TPU chip/host — the
# per-scene training is embarrassingly parallel (SURVEY.md §2.4).
set -euo pipefail

ROOT_DIR=${1:?usage: train_objaverse_batch.sh <root_dir> <scene[,scene...]> [out_dir]}
SCENES=${2:?}
OUT=${3:-out}

python train_ngp_nerf.py \
    --dataset objaverse \
    --root_dir "$ROOT_DIR" \
    --scene "$SCENES" \
    --out_dir "$OUT" \
    --factor 1 \
    --multi_blocks \
    --min_num_blocks 2 --max_num_blocks 2 \
    --max_iterations 10000 \
    --n_validation 2500 \
    --n_checkpoint 5000
