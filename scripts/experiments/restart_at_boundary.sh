#!/bin/bash
# Kill the supervised fleet python at the NEXT stage-2 block boundary so
# the supervisor relaunches it with freshly-committed code. Every stage
# caches its artifacts, so a boundary restart loses nothing but the ~60s
# supervisor backoff + process warmup (compile cache is persistent).
#
# Used mid-round when a fix lands that the ALREADY-RUNNING fleet process
# must honor before its next stage begins (e.g. the stage-3 train
# deadline). Kills by exact PID from the supervisor's pidfile — never by
# pattern.
#
# Usage: setsid nohup bash scripts/experiments/restart_at_boundary.sh \
#            > /tmp/boundary_restart.log 2>&1 &
set -u
log=${1:-/tmp/stage3.log}
deadline=$(( $(date +%s) + ${2:-1800} ))   # give up after 30 min

# grep -c prints 0 (and exits 1) on a log with no matches — an || echo
# would emit "0\n0" and break the -gt tests below (ADVICE r4)
n0=$(grep -c '^\[stage2\]' "$log" 2>/dev/null); n0=${n0:-0}
echo "[boundary-restart] waiting past $n0 stage2 lines in $log"
while : ; do
  sleep 5
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "[boundary-restart] timed out — no boundary seen; giving up"
    exit 1
  fi
  n=$(grep -c '^\[stage2\]' "$log" 2>/dev/null); n=${n:-0}
  if [ "$n" -gt "$n0" ]; then
    sleep 2   # let the per-scene artifact copy start/finish if tiny
    pid=$(cat "${log}.pid" 2>/dev/null) || exit 1
    echo "[boundary-restart] boundary hit ($n stage2 lines) — kill $pid"
    kill "$pid" 2>/dev/null
    exit 0
  fi
done
