#!/bin/bash
# Round-3 TPU gate queue: waits for the stage-3 fleet supervisor to
# finish (success or give-up in /tmp/stage3.log), then runs the queued
# TPU experiments SERIALLY (the axon compile tunnel breaks under
# parallel load — CLAUDE.md). Each item is bounded by `timeout` so a
# wedged tunnel cannot eat the whole session.
#
# Queue (by round-3 value):
#   1. layout_gate.py         — encoder-layout + RLE race at data scale
#   2. visibility_effect.py   — grid-vs-exact converged-RRE effect
#                               (skipped if the fleet left no stage-3 ckpt)
#   3. probe_regtr_step.py    — RegTr step decomposition
#   4. probe_render_parts.py  — march/shade decomposition at bench shapes
#                               (render-ceiling irreducibility evidence)
# (probe_pallas_scatter ran pre-fleet this round: /tmp/probe_scatter.log —
#  all Pallas scatter variants fail remote mosaic compile, HTTP 500;
#  sorted-hint XLA results are recorded in the packed_grid docstring.)
#
# Usage: setsid nohup bash scripts/experiments/post_fleet_queue.sh \
#            > /tmp/post_fleet.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

echo "[queue] waiting for fleet supervisor to finish..."
while ! grep -qE '\[supervisor\] (success|giving up)' /tmp/stage3.log 2>/dev/null; do
  sleep 60
done
grep -E '\[supervisor\] (success|giving up)' /tmp/stage3.log
sleep 30   # let the fleet process fully exit / tunnel settle

run() {
  local t=$1; shift
  echo "[queue] === $* ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@"
  echo "[queue] rc=$? ($(date +%H:%M:%S))"
}

# validate the driver's headline artifact first (train/extract metrics are
# new this round; a crash here must be found while there is time to fix)
run 1800 python -u bench.py
run 9000 python -u scripts/experiments/layout_gate.py

if [ -f /tmp/stage3_fleet/regout/stage3/model/model.ckpt ] \
    || ls /tmp/stage3_fleet/regout/stage3/model/*.ckpt >/dev/null 2>&1; then
  run 7200 python -u scripts/experiments/visibility_effect.py
else
  echo "[queue] no stage-3 checkpoint — skipping visibility_effect"
fi

run 2700 python -u scripts/perf/probe_regtr_step.py
run 2400 python -u scripts/perf/probe_render_parts.py
echo "[queue] DONE ($(date +%H:%M:%S))"
