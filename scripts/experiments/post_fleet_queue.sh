#!/bin/bash
# Round-3 TPU gate queue: waits for the stage-3 fleet supervisor to
# finish (success or give-up in /tmp/stage3.log), then runs the queued
# TPU experiments SERIALLY (the axon compile tunnel breaks under
# parallel load — CLAUDE.md). Each item is bounded by `timeout` so a
# wedged tunnel cannot eat the whole session.
#
# Queue (by round-3 value):
#   1. layout_gate.py         — encoder-layout + RLE race at data scale
#   2. probe_pallas_scatter   — Pallas serial-accumulate scatter measure
#   3. visibility_effect.py   — grid-vs-exact converged-RRE effect
#                               (skipped if the fleet left no stage-3 ckpt)
#   4. probe_regtr_step.py    — RegTr step decomposition
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

run 5400 python -u scripts/experiments/layout_gate.py
run 1800 python -u scripts/perf/probe_pallas_scatter.py

if [ -f /tmp/stage3_fleet/regout/stage3/model/model.ckpt ] \
    || ls /tmp/stage3_fleet/regout/stage3/model/*.ckpt >/dev/null 2>&1; then
  run 7200 python -u scripts/experiments/visibility_effect.py
else
  echo "[queue] no stage-3 checkpoint — skipping visibility_effect"
fi

run 2700 python -u scripts/perf/probe_regtr_step.py
echo "[queue] DONE ($(date +%H:%M:%S))"
