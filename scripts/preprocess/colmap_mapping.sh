#!/usr/bin/env bash
# COLMAP SfM pipeline for real-world datasets (reference
# scripts/preprocess/colmap_mapping.sh:19-47 parity):
#   feature_extractor -> (vocab_tree|exhaustive) matcher -> mapper
# Requires the `colmap` binary.
set -euo pipefail

IMAGE_DIR=${1:?usage: colmap_mapping.sh <image_dir> <workspace> [vocab_tree]}
WORKSPACE=${2:?}
VOCAB_TREE=${3:-}

mkdir -p "$WORKSPACE"
DB="$WORKSPACE/database.db"

colmap feature_extractor \
    --database_path "$DB" \
    --image_path "$IMAGE_DIR" \
    --ImageReader.single_camera 1 \
    --ImageReader.camera_model SIMPLE_RADIAL

if [ -n "$VOCAB_TREE" ]; then
    colmap vocab_tree_matcher \
        --database_path "$DB" \
        --VocabTreeMatching.vocab_tree_path "$VOCAB_TREE"
else
    colmap exhaustive_matcher --database_path "$DB"
fi

mkdir -p "$WORKSPACE/sparse"
colmap mapper \
    --database_path "$DB" \
    --image_path "$IMAGE_DIR" \
    --output_path "$WORKSPACE/sparse"

echo "sparse model at $WORKSPACE/sparse/0"
