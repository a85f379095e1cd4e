#!/bin/bash
# Round-5 TPU queue: layout-gated 40-scene fleet, then the remaining
# evidence gates, SERIALLY (the axon compile tunnel breaks under
# parallel load). Every stage caches artifacts + commits metric JSONs,
# so a VM restart or session death loses at most one stage.
#
#   1. wait for layout_gate.py (if running) and pick the fleet encoder
#      layout by its decision rule (fastest config whose val PSNR and
#      surface-voxel count match the L8F4 incumbent);
#   2. 40-scene fleet under supervise.sh: stage1/2 for scenes 24-39,
#      stage-3 RegTr (stage3c, 12k iters, leak-fixed device cache,
#      live InfoNCE), in-fleet held-out eval on 8 scenes x 2 orders;
#   3. stage3_eval_only.py — definitive fresh-process eval;
#   4. cli_eval_regtr.sh — component-#4 CLI demo on a held-out scene;
#   5. visibility_effect.py — grid-vs-exact supervision effect;
#   6. bench.py refresh.
#
# Usage: setsid nohup env ROUND_END_EPOCH=<epoch_s> bash \
#   scripts/experiments/round5_queue.sh > /tmp/round5_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

ROUND_END_EPOCH="${ROUND_END_EPOCH:-$(( $(date -u +%s) + 32400 ))}"
remaining() { echo $(( ROUND_END_EPOCH - $(date -u +%s) )); }

# ---- 1. layout gate -------------------------------------------------------
if [ -f /tmp/layout_gate.pid ]; then
  gpid=$(cat /tmp/layout_gate.pid)
  while kill -0 "$gpid" 2>/dev/null; do
    echo "[queue] layout_gate running (pid $gpid, $(remaining)s left)"
    sleep 60
  done
fi

choice=$(python - <<'EOF'
import json
try:
    r = json.load(open("experiments/stage3/layout_gate.json"))
except Exception:
    r = {}
inc = r.get("L8F4", {})
best, best_s = "L8F4", inc.get("train_s", 9e9)
for name in ("L4F8_rle", "L4F8", "L8F4_rle"):
    c = r.get(name, {})
    if "error" in c or not c:
        continue
    # quality bar: val PSNR within 0.3 dB and surface count within 25%
    # of the incumbent (extraction feeds registration; a starved shell
    # is a silent quality regression two stages later)
    if (c.get("val_psnr", 0) >= inc.get("val_psnr", 0) - 0.3
            and abs(c.get("surface_mask", 0) - inc.get("surface_mask", 1))
                <= 0.25 * max(inc.get("surface_mask", 1), 1)
            and c.get("train_s", 9e9) < best_s):
        best, best_s = name, c["train_s"]
print(best)
EOF
)
layout="${choice%_rle}"
rle=""
case "$choice" in *_rle) rle="0.0016913"; esac   # sqrt(3)/1024
echo "[queue] layout gate choice: $choice (layout=$layout rle=$rle)"

# ---- 2. fleet -------------------------------------------------------------
# stage-3 training stops early enough to leave the eval + queue window:
# reserve 2.5 h behind the training cutoff.
train_deadline=$(( ROUND_END_EPOCH - 9000 ))
echo "[queue] fleet: train deadline $(date -u -d @${train_deadline} +%H:%M:%S)"
env STAGE3_SCENES=40 STAGE3_TEST_SCENES=8 STAGE3_REG_ITERS=12000 \
    STAGE3_EXPNAME=stage3c STAGE3_LAYOUT="$layout" STAGE3_RLE="$rle" \
    STAGE3_TRAIN_DEADLINE="$train_deadline" \
    bash scripts/experiments/supervise.sh /tmp/stage3.log 2400 40 -- \
    python -u scripts/experiments/stage3_fleet.py
echo "[queue] fleet done rc=$? ($(date -u +%H:%M:%S), $(remaining)s left)"

run() {
  local cap=$1; shift
  local left; left=$(remaining)
  if [ "$left" -lt 300 ]; then
    echo "[queue] SKIP (deadline): $*"
    return
  fi
  local t=$(( cap < left ? cap : left ))
  echo "[queue] === $* (cap ${t}s, $(date -u +%H:%M:%S)) ==="
  timeout "$t" "$@"
  echo "[queue] rc=$? ($(date -u +%H:%M:%S))"
  sleep 20
}

# ---- 3-6. post-fleet gates -----------------------------------------------
run 2700 env STAGE3_SCENES=40 STAGE3_TEST_SCENES=8 STAGE3_EXPNAME=stage3c \
    python -u scripts/experiments/stage3_eval_only.py
run 1800 env EVAL_SCENE=scene_36 REG_EXPNAME=stage3c \
    bash scripts/experiments/cli_eval_regtr.sh
run 2400 env STAGE3_SCENES=40 STAGE3_TEST_SCENES=8 STAGE3_EXPNAME=stage3c \
    VISFX_ITERS=400 python -u scripts/experiments/visibility_effect.py
run 1800 python -u bench.py
echo "[queue] all done ($(date -u +%H:%M:%S))"
