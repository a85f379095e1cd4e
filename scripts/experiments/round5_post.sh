#!/bin/bash
# Post-queue opportunistic TPU work for round 5: runs ONLY after
# round5_queue.sh exits (serial TPU discipline — the axon tunnel breaks
# under parallel load), and only if enough round time remains.
#
#   1. infonce_ab.py — the VERDICT-#2 done-criterion A/B (feature loss
#      0.1 vs 0.0 at equal config on the fleet artifacts);
#   2. probe_render.py — render decomposition at the new L4F8 default
#      (VERDICT #7: break the plateau or prove the ceiling).
#
# Usage: setsid nohup env ROUND_END_EPOCH=<epoch_s> bash \
#   scripts/experiments/round5_post.sh > /tmp/round5_post.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

ROUND_END_EPOCH="${ROUND_END_EPOCH:?set ROUND_END_EPOCH}"
remaining() { echo $(( ROUND_END_EPOCH - $(date -u +%s) )); }

qpid=$(cat /tmp/round5_queue.pid 2>/dev/null || echo "")
while [ -n "$qpid" ] && kill -0 "$qpid" 2>/dev/null; do
  sleep 120
done
echo "[post] queue finished ($(date -u +%H:%M:%S), $(remaining)s left)"
sleep 30   # let the tunnel settle after the queue's last job

left=$(remaining)
if [ "$left" -gt 4200 ]; then
  iters=2500
elif [ "$left" -gt 2400 ]; then
  iters=1200
else
  iters=0
fi
if [ "$iters" -gt 0 ]; then
  cap=$(( $(remaining) - 900 ))
  echo "[post] infonce_ab AB_ITERS=$iters (cap ${cap}s)"
  timeout "$cap" env AB_ITERS="$iters" \
    python -u scripts/experiments/infonce_ab.py
  echo "[post] infonce_ab rc=$? ($(date -u +%H:%M:%S))"
  sleep 20
else
  echo "[post] SKIP infonce_ab (${left}s left)"
fi

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
