#!/bin/bash
# Overlap CPU scene generation with the fleet's TPU-bound training windows.
#
# make_scene (~2-3 min of single-CPU raytracing) sits on the fleet's
# serial path for every scene. This watcher generates upcoming scenes
# ahead of the fleet, but ONLY while the fleet is provably inside a
# training window — the last /tmp/stage3.log line is a fresh `step N |`
# line below step 1500 — and SIGSTOPs the worker everywhere else:
# validate/extraction host-sync phases stall ~10x under CPU contention
# (CLAUDE.md), and the step-1500..2000 stretch ends in validate with no
# log signal. One scene per worker; if the fleet catches up to the
# worker's target scene the worker is killed (the fleet regenerates the
# scene itself — make_scene output is seed-deterministic either way,
# and stage1 only trusts a scene once transforms.json exists, which
# make_scene writes LAST).
#
# Usage: setsid nohup env N_SCENES=22 bash \
#   scripts/experiments/pregen_overlap.sh > /tmp/pregen_overlap.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo
log=/tmp/stage3.log
N_SCENES="${N_SCENES:-22}"

fleet_scene() {  # highest scene index the fleet has mentioned
  grep -oE 'scene_[0-9]+' "$log" 2>/dev/null | sed 's/scene_//' | sort -n | tail -1
}
next_target() {  # lowest ungenerated scene strictly ahead of the fleet
  local fs; fs=$(fleet_scene); fs=${fs:-0}
  local i s
  for i in $(seq $((10#$fs + 1)) $((N_SCENES - 1))); do
    s=$(printf 'scene_%02d' "$i")
    if [ ! -f "/tmp/stage3_fleet/data/$s/transforms.json" ]; then
      echo "$i"; return
    fi
  done
  echo ""
}

pid=""
target=""
while : ; do
  if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
    [ -n "$pid" ] && wait "$pid" 2>/dev/null
    pid=""
    t=$(next_target)
    if [ -z "$t" ]; then
      echo "[overlap] all scenes generated ($(date -u +%H:%M:%S))"
      exit 0
    fi
    target=$t
    nice -n 19 env JAX_PLATFORMS=cpu python -u \
      scripts/experiments/pregen_scenes.py "$t" $((t + 1)) \
      >> /tmp/pregen.log 2>&1 &
    pid=$!
    kill -STOP "$pid" 2>/dev/null
    echo "[overlap] worker for scene $target: pid $pid (stopped, $(date -u +%H:%M:%S))"
  fi

  fs=$(fleet_scene); fs=${fs:-0}
  if [ -n "$target" ] && [ "$((10#$fs))" -ge "$target" ]; then
    kill -CONT "$pid" 2>/dev/null
    kill "$pid" 2>/dev/null
    wait "$pid" 2>/dev/null
    pid=""
    echo "[overlap] fleet caught scene $target — worker killed"
    sleep 5
    continue
  fi

  last=$(tail -1 "$log" 2>/dev/null)
  age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || echo 0) ))
  want=stop
  case "$last" in
    "step "*"|"*)
      stepn=${last#step }; stepn=${stepn%% *}
      if [ "$age" -lt 45 ] && [ "$stepn" -lt 1500 ] 2>/dev/null; then
        want=run
      fi ;;
  esac
  if [ "$want" = run ]; then
    kill -CONT "$pid" 2>/dev/null
  else
    kill -STOP "$pid" 2>/dev/null
  fi
  sleep 10
done
