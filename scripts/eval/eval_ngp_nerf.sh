#!/usr/bin/env bash
# Evaluate trained NGP blocks + extract voxel grids (reference
# scripts/eval/ parity).
set -euo pipefail
ROOT_DIR=${1:?usage: eval_ngp_nerf.sh <root_dir> <scene> [out_dir]}
SCENE=${2:?}
OUT=${3:-out}

python eval_ngp_nerf.py \
    --dataset objaverse \
    --root_dir "$ROOT_DIR" \
    --scene "$SCENE" \
    --expname "$SCENE" \
    --out_dir "$OUT" \
    --factor 1
