#!/bin/bash
# Post-queue opportunistic TPU work for round 5b: runs ONLY after
# round5b_queue.sh prints its "all done" marker (serial TPU discipline),
# and only if round time remains: probe_render decomposition at the new
# L4F8 default (VERDICT #7: break the render plateau or prove the
# ceiling — the probe is the ceiling-evidence arm).
#
# Usage: setsid nohup env ROUND_END_EPOCH=<epoch_s> bash \
#   scripts/experiments/round5b_post.sh > /tmp/round5b_post.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

ROUND_END_EPOCH="${ROUND_END_EPOCH:?set ROUND_END_EPOCH}"
remaining() { echo $(( ROUND_END_EPOCH - $(date -u +%s) )); }

while ! grep -q '\[queue\] all done' /tmp/round5b_queue.log 2>/dev/null; do
  if [ "$(remaining)" -lt 120 ]; then
    echo "[post] round over before queue finished — exiting"
    exit 0
  fi
  sleep 120
done
echo "[post] queue finished ($(date -u +%H:%M:%S), $(remaining)s left)"
sleep 30   # let the tunnel settle after the queue's last job

left=$(remaining)
if [ "$left" -gt 700 ]; then
  echo "[post] probe_render at L4F8 default (cap $(( left - 120 ))s)"
  timeout $(( left - 120 )) python -u scripts/perf/probe_render.py \
    > /tmp/probe_render_l4f8.log 2>&1
  echo "[post] probe_render rc=$? — tail:"
  tail -5 /tmp/probe_render_l4f8.log
else
  echo "[post] SKIP probe_render (${left}s left)"
fi
echo "[post] done ($(date -u +%H:%M:%S))"
