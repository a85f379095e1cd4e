#!/usr/bin/env bash
# Batch-render downloaded Objaverse GLBs with Blender (reference
# scripts/blender/objaverse_to_blender.sh parity). Requires `blender` on
# PATH and a directory of .glb files.
set -euo pipefail

GLB_DIR=${1:?usage: objaverse_to_blender.sh <glb_dir> <out_root> [views]}
OUT_ROOT=${2:?}
VIEWS=${3:-120}
JOBS=${JOBS:-6}

render_one() {
    glb="$1"
    name=$(basename "$glb" .glb)
    out="$OUT_ROOT/$name"
    [ -f "$out/transforms.json" ] && { echo "skip $name"; return; }
    blender -b -P "$(dirname "$0")/bpy_render_views.py" -- \
        --glb "$glb" --out "$out" --views "$VIEWS"
}
export -f render_one
export OUT_ROOT VIEWS

find "$GLB_DIR" -name '*.glb' | xargs -P "$JOBS" -I{} bash -c 'render_one {}'
