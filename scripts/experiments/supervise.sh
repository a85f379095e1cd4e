#!/bin/bash
# Stall-detecting supervisor for long TPU runs through the axon tunnel.
#
# The remote-compile tunnel has wedged long python processes before
# (futex-wait, no error, no output — see CLAUDE.md); every stage of the
# fleet harness caches its artifacts, so kill-and-restart is safe and
# cheap. Restart also covers transient tunnel errors (exit != 0).
#
# Usage: supervise.sh <logfile> <stall_seconds> <max_attempts> -- cmd...
set -u
log=$1; stall=$2; max_attempts=$3; shift 4

attempt=0
while : ; do
  attempt=$((attempt + 1))
  echo "[supervisor] attempt ${attempt}: $*" >> "$log"
  "$@" >> "$log" 2>&1 &
  pid=$!
  echo "$pid" > "${log}.pid"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$log") ))
    if [ "$age" -gt "$stall" ]; then
      echo "[supervisor] log stale ${age}s — killing $pid" >> "$log"
      kill "$pid" 2>/dev/null
      sleep 10
      kill -9 "$pid" 2>/dev/null
      # killing a wedged TPU process leaves the tunnel sick for ~5 min
      sleep 300
      break
    fi
  done
  wait "$pid"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[supervisor] success after ${attempt} attempt(s)" >> "$log"
    exit 0
  fi
  if [ "$attempt" -ge "$max_attempts" ]; then
    echo "[supervisor] giving up after ${attempt} attempts (rc=$rc)" >> "$log"
    exit 1
  fi
  echo "[supervisor] exit rc=${rc} — restarting in 60s" >> "$log"
  sleep 60
done
