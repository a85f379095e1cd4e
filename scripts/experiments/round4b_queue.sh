#!/bin/bash
# Round-4b TPU gate queue: waits for the EXTENDED (24-scene) stage-3b
# fleet supervisor to finish, then runs the remaining round-4 gates
# SERIALLY (the axon compile tunnel breaks under parallel load).
#
# Queue (by value):
#   1. stage3_eval_only.py   — the DEFINITIVE held-out eval: fresh process
#                              picks up the post-launch eval code (colors
#                              into ICP, multi-scale classical race); the
#                              in-fleet eval ran the as-launched module.
#   2. cli_eval_regtr.sh     — component-#4 CLI demo on a held-out scene
#                              (--icp_refine, artifacts + videos), committed.
#   3. layout_gate.py        — encoder-layout + RLE race at data scale
#                              (VERDICT r3 #5, queued since round 3).
#   4. visibility_effect.py  — grid-vs-exact supervision effect
#                              (VERDICT r3 #7, reduced iters via VISFX_ITERS).
#   5. probe_regtr_step.py   — RegTr step decomposition.
#   6. bench.py              — refresh the driver artifact numbers last.
#
# Usage: setsid nohup env QUEUE_DEADLINE=+NNN bash \
#            scripts/experiments/round4b_queue.sh > /tmp/round4b_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

QUEUE_DEADLINE="${QUEUE_DEADLINE:-+18000}"
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
sleep 30

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
  sleep 15
}

export STAGE3_SCENES=24 STAGE3_TEST_SCENES=4 STAGE3_EXPNAME=stage3b
run 2700 python -u scripts/experiments/stage3_eval_only.py
run 2400 bash scripts/experiments/cli_eval_regtr.sh
run 7200 python -u scripts/experiments/layout_gate.py
export VISFX_ITERS="${VISFX_ITERS:-300}"
run 5400 python -u scripts/experiments/visibility_effect.py
run 1800 python -u scripts/perf/probe_regtr_step.py
run 1800 python -u scripts/perf/probe_render_dispatch.py
run 1800 python -u scripts/perf/probe_render_parts.py
run 1800 python -u bench.py
echo "[queue] DONE ($(date -u +%H:%M:%S))"
