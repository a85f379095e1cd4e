#!/bin/bash
# Round-end TPU-free guard. At the given epoch deadline, kill (by process
# GROUP, exact pids — never by pattern) any still-running fleet /
# gate-queue / pytest-watcher jobs so the driver's round-end bench.py run
# finds an idle tunnel and an idle host. A fleet that already finished is
# a no-op (leader gone). Each group is only killed if its leader is alive
# AND its cmdline matches the expected script (PID-reuse safety).
#
# Usage: setsid nohup bash scripts/experiments/tpu_guard.sh <epoch> \
#            <pgid>:<cmdline-substr> [...] > /tmp/tpu_guard.log 2>&1 &
set -u
deadline=$1; shift

while [ "$(date +%s)" -lt "$deadline" ]; do sleep 30; done

for spec in "$@"; do
  pg=${spec%%:*}; pat=${spec#*:}
  cmd=$(tr '\0' ' ' < "/proc/$pg/cmdline" 2>/dev/null || true)
  case "$cmd" in
    *"$pat"*)
      echo "[tpu-guard] $(date -u +%H:%M:%S) killing group $pg ($pat)"
      kill -TERM -- -"$pg" 2>/dev/null
      ;;
    *) echo "[tpu-guard] group $pg gone or mismatched ('$cmd') — skip" ;;
  esac
done
sleep 20
for spec in "$@"; do
  pg=${spec%%:*}; pat=${spec#*:}
  cmd=$(tr '\0' ' ' < "/proc/$pg/cmdline" 2>/dev/null || true)
  case "$cmd" in
    *"$pat"*) kill -9 -- -"$pg" 2>/dev/null ;;
  esac
done
echo "[tpu-guard] done $(date -u +%H:%M:%S)"
