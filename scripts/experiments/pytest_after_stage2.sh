#!/bin/bash
# Run the FULL CPU test suite only after the fleet's LAST stage-2
# extraction has finished: a CPU-heavy pytest stalls TPU host-sync
# phases (extraction) ~10x (CLAUDE.md) but does not slow dispatch-bound
# training, so the safe window is stage 3 (RegTr training, device-cached
# grids). Niced to stay out of the fleet's way entirely.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LAST_SCENE="${LAST_SCENE:-scene_15}"

# /tmp/stage3.log is APPEND-ONLY across fleets (supervise.sh) — old
# rounds' stage-2/iter lines linger, so match only lines written after
# THIS watcher started (round-5 false-fire: a round-4 `iter` line
# satisfied the grep while stage 1 was still running).
n0=$(wc -l < /tmp/stage3.log 2>/dev/null); n0=${n0:-0}
fresh() { tail -n "+$((n0 + 1))" /tmp/stage3.log 2>/dev/null; }

echo "[pytest-watch] waiting for stage2 $LAST_SCENE block_1 ..."
while ! fresh | grep -q "\[stage2\] $LAST_SCENE block_1"; do
  sleep 120
done
# stage-3 STARTUP is host-heavy too (24x voxel-grid torch.load + fresh
# RegTr compiles through the tunnel): wait until training is actually
# underway (first logged iteration), then a margin for the val compile
echo "[pytest-watch] stage2 complete; waiting for stage-3 training ..."
while ! fresh | grep -qE "^iter [0-9]+ \|"; do
  sleep 120
done
sleep 600
echo "[pytest-watch] stage-3 underway; running full suite ($(date -u +%H:%M:%S))"
nice -n 19 python -m pytest tests/ -q > /tmp/pytest_full.log 2>&1
echo "rc=$?" >> /tmp/pytest_full.log
tail -5 /tmp/pytest_full.log
