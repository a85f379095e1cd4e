#!/bin/bash
# Component-#4 demonstration on REAL fleet artifacts: the full
# eval_nerf_regtr.py CLI (reference eval_nerf_regtr.py:250-438 parity)
# against the stage-3 fleet's trained checkpoint and extracted blocks —
# transformation_est.json, pose .pts, aligned/unaligned/keypoint PLYs,
# FGR side-by-side, and orbit videos (ffmpeg-gated). JSON evidence is
# committed; the PLY/mp4 bulk stays in /tmp (listed in the evidence).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
REG=/tmp/stage3_fleet/regdata
OUTDIR=/tmp/stage3_fleet/regout
SCENE="${EVAL_SCENE:-scene_20}"
REGEXP="${REG_EXPNAME:-stage3b}"

if [ ! -d "$REG/nerf_models/$SCENE" ]; then
  echo "[cli-eval] no fleet regdata for $SCENE; skipping"; exit 0
fi
CKPT="$OUTDIR/$REGEXP/model/model_best.ckpt"
[ -f "$CKPT" ] || CKPT="$OUTDIR/$REGEXP/model/model.ckpt"
[ -f "$CKPT" ] || CKPT="$OUTDIR/stage3/model/model_best.ckpt"
if [ ! -f "$CKPT" ]; then
  echo "[cli-eval] no stage-3 checkpoint; skipping"; exit 0
fi

DREG_RENDER_VIDEOS=1 python -u eval_nerf_regtr.py --dataset objaverse \
  --root_dir "$REG" --scene "$SCENE" --expname "$REGEXP" --out_dir "$OUTDIR" \
  --aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0 --robust_loss --icp_refine --ckpt_path "$CKPT"
rc=$?

DST=experiments/stage3/cli_eval
mkdir -p "$DST"
cp "$OUTDIR/$REGEXP/eval/metrics_test.json" "$DST/" 2>/dev/null || true
cp "$OUTDIR/$REGEXP/eval/fgr_metrics_test.json" "$DST/" 2>/dev/null || true
cp "$OUTDIR/$REGEXP/eval/$SCENE/transformation_est.json" "$DST/" 2>/dev/null || true
ls -la "$OUTDIR/$REGEXP/eval/$SCENE" > "$DST/artifact_listing_$SCENE.txt" 2>/dev/null || true
echo "rc=$rc ckpt=$CKPT scene=$SCENE" > "$DST/run_info.txt"
git add experiments/stage3/cli_eval
git commit -q -m "Evidence: eval_nerf_regtr CLI artifacts on fleet-trained checkpoint" \
    -- experiments/stage3/cli_eval
