#!/usr/bin/env bash
# Evaluate the registration transformer on held-out pairs + FGR baseline.
set -euo pipefail
ROOT_DIR=${1:?usage: eval_nerf_regtr.sh <root_dir> [expname]}
EXP=${2:-dreg_nerf}

python eval_nerf_regtr.py \
    --dataset objaverse \
    --root_dir "$ROOT_DIR" \
    --expname "$EXP"
