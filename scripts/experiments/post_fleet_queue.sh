#!/bin/bash
# Round-3 TPU gate queue: waits for the stage-3 fleet supervisor to
# finish (success or give-up in /tmp/stage3.log), then runs the queued
# TPU experiments SERIALLY (the axon compile tunnel breaks under
# parallel load — CLAUDE.md). DEADLINE-AWARE: every item's timeout is
# min(item cap, seconds until $QUEUE_DEADLINE UTC) so the TPU is free
# for the driver's end-of-round bench run no matter how late the fleet
# finishes. layout_gate writes results incrementally, so a deadline
# kill keeps completed configs.
#
# Queue (by round-3 value):
#   1. bench.py               — validate the driver artifact (train/extract
#                               metrics are new this round)
#   2. layout_gate.py         — encoder-layout + RLE race at data scale
#   3. visibility_effect.py   — grid-vs-exact converged-RRE effect
#                               (skipped if the fleet left no stage-3 ckpt)
#   4. probe_regtr_step.py    — RegTr step decomposition
#   5. probe_render_parts.py  — march/shade decomposition at bench shapes
# (probe_pallas_scatter ran pre-fleet this round: /tmp/probe_scatter.log —
#  all Pallas scatter variants fail remote mosaic compile, HTTP 500;
#  sorted-hint XLA results are recorded in the packed_grid docstring.)
#
# Usage: setsid nohup bash scripts/experiments/post_fleet_queue.sh \
#            > /tmp/post_fleet.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

# Hard stop for queue work. Leaves the tunnel idle with margin before the
# driver's round-end bench. Accepts "HH:MM" (UTC, same day) or "+SECONDS"
# relative to launch; defaults to +50 min (a round is ~1 h).
QUEUE_DEADLINE="${QUEUE_DEADLINE:-+3000}"
case "$QUEUE_DEADLINE" in
  +*) deadline_epoch=$(( $(date -u +%s) + ${QUEUE_DEADLINE#+} )) ;;
  *)  deadline_epoch=$(date -u -d "today $QUEUE_DEADLINE" +%s) ;;
esac

remaining() { echo $(( deadline_epoch - $(date -u +%s) )); }

echo "[queue] waiting for fleet supervisor to finish..."
while ! grep -qE '\[supervisor\] (success|giving up)' /tmp/stage3.log 2>/dev/null; do
  sleep 60
done
grep -E '\[supervisor\] (success|giving up)' /tmp/stage3.log
sleep 30   # let the fleet process fully exit / tunnel settle

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
  sleep 15   # tunnel settle between TPU processes
}

# validate the driver's headline artifact first (train/extract metrics are
# new this round; a crash here must be found while there is time to fix)
run 1800 python -u bench.py

# VERDICT r3 #6 evidence: one unattended >=5k-step run through the
# train_ngp_nerf.py CLI (watchdog active), result JSON committed
run 2400 bash scripts/experiments/cli_train_5k.sh

# dispatch-level pipelining race EARLY (cheap, ~10 min): its verdict
# gates flipping the eval/image render paths to the host-loop pattern,
# and the flip needs time to land before round end
run 1800 python -u scripts/perf/probe_render_dispatch.py

run 7200 python -u scripts/experiments/layout_gate.py

# cheap march/shade decomposition BEFORE the long visibility run: it is
# the render-ceiling irreducibility evidence (VERDICT r2 #4) and fits in
# minutes, while visibility_effect's exact-ft tail can eat an hour
run 1800 python -u scripts/perf/probe_render_parts.py

# component-#4 demonstration: full RegEvaluator CLI (artifacts + videos +
# FGR side-by-side) on the fleet's trained checkpoint, JSONs committed
run 2400 bash scripts/experiments/cli_eval_regtr.sh

if [ -f /tmp/stage3_fleet/regout/stage3/model/model.ckpt ] \
    || ls /tmp/stage3_fleet/regout/stage3/model/*.ckpt >/dev/null 2>&1; then
  export VISFX_ITERS="${VISFX_ITERS:-300}"
  run 5400 python -u scripts/experiments/visibility_effect.py
else
  echo "[queue] no stage-3 checkpoint — skipping visibility_effect"
fi

run 1800 python -u scripts/perf/probe_regtr_step.py
echo "[queue] DONE ($(date -u +%H:%M:%S))"
