#!/bin/bash
# Round-5b TPU queue: VM-restart recovery relaunch of the round-5 fleet.
#
# The 19:27 UTC VM restart wiped /tmp (all stage-1/2 artifacts for the
# 28 scenes built so far + jax compile cache). Rebuilding 40 scenes at
# ~12-14 min/scene serially does not fit the remaining wall-clock, so
# this queue re-sizes the fleet to what fits while keeping every
# round-5 quality lever:
#   - 22 scenes (14 train + 8 held-out = 16 deterministic val pairs,
#     VERDICT r4 item 8);
#   - stage-1 at 2000 iters under L4F8+RLE — the committed layout gate
#     (experiments/stage3/layout_gate.json) measured this config at
#     2000 iters: val PSNR 33.24 / 91k surface voxels vs the L8F4
#     incumbent's 32.65 / 77k at the same budget, 3.7x faster;
#   - stage-3 12k-iter budget cut by a wall-clock deadline that
#     reserves the held-out eval + gate window;
#   - post-fleet, deadline-aware: bench refresh, InfoNCE A/B
#     (VERDICT item 2 done-criterion), CLI eval demo, visibility
#     effect.
#
# Usage: setsid nohup env ROUND_END_EPOCH=<epoch_s> bash \
#   scripts/experiments/round5b_queue.sh > /tmp/round5b_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

ROUND_END_EPOCH="${ROUND_END_EPOCH:-$(( $(date -u +%s) + 27000 ))}"
remaining() { echo $(( ROUND_END_EPOCH - $(date -u +%s) )); }

N_SCENES="${N_SCENES:-22}"
N_TEST="${N_TEST:-8}"
N_TRAIN=$(( N_SCENES - N_TEST ))

# reserve 65 min behind the stage-3 training cutoff: in-fleet held-out
# eval (16 pairs x regtr+ICP+FGR race) + margin for one tunnel wedge
train_deadline=$(( ROUND_END_EPOCH - 3900 ))
echo "[queue] fleet: ${N_SCENES} scenes, train deadline $(date -u -d @${train_deadline} +%H:%M:%S)"
env STAGE3_SCENES="$N_SCENES" STAGE3_TEST_SCENES="$N_TEST" \
    STAGE3_NGP_ITERS=2000 STAGE3_REG_ITERS=12000 \
    STAGE3_EXPNAME=stage3c STAGE3_LAYOUT=L4F8 STAGE3_RLE=0.0016913 \
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

run 2100 python -u bench.py
run 3000 env AB_ITERS=2000 AB_TRAIN_SCENES="$N_TRAIN" AB_TEST_SCENES="$N_TEST" \
    python -u scripts/experiments/infonce_ab.py
run 1500 env EVAL_SCENE=scene_18 REG_EXPNAME=stage3c \
    bash scripts/experiments/cli_eval_regtr.sh
run 2400 env STAGE3_SCENES="$N_SCENES" STAGE3_TEST_SCENES="$N_TEST" \
    STAGE3_EXPNAME=stage3c VISFX_ITERS=400 \
    python -u scripts/experiments/visibility_effect.py
echo "[queue] all done ($(date -u +%H:%M:%S))"
