#!/bin/bash
# One-command round bootstrap: launch the stage-3 fleet (the longest
# TPU job — must start in the round's FIRST minutes) under the
# stall-detecting supervisor, then the deadline-aware TPU gate queue
# behind it. Both survive Claude-session death via setsid nohup (but NOT
# a VM restart — the fleet commits its metric JSONs incrementally so
# evidence survives; see stage3_fleet.commit_progress).
#
# Usage (from /root/repo, at round start):
#   ROUND_SECONDS=3600 bash scripts/experiments/round_boot.sh
#
# ROUND_SECONDS: wall budget from NOW until the driver's round-end bench;
# the queue deadline is set to ROUND_SECONDS - 600 so the tunnel is idle
# with margin.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

ROUND_SECONDS="${ROUND_SECONDS:-3600}"
# ADVICE r3: floor the queue budget — ROUND_SECONDS <= 600 must not put
# the deadline in the past (the queue would silently skip every gate)
queue_budget=$(( ROUND_SECONDS - 600 ))
if [ "$queue_budget" -lt 300 ]; then queue_budget=300; fi
export QUEUE_DEADLINE="+${queue_budget}"

# ADVICE r3: a stale log from a previous round already contains the
# supervisor's success/give-up line — post_fleet_queue would unblock
# immediately and run gates CONCURRENTLY with the fresh fleet (parallel
# tunnel load breaks the remote compiler). Start from a clean log.
rm -f /tmp/stage3.log /tmp/stage3.log.pid /tmp/stage3_supervisor.log /tmp/post_fleet.log

# Stall window must exceed the worst single cold compile through the
# tunnel (~15 min, CLAUDE.md) — the fleet emits no log lines while a
# compile is in flight, and a false kill both wastes an attempt and
# leaves the tunnel sick ~5 min. Attempts sized for a long round: each
# restart resumes from caches/checkpoints, so retries are cheap.
STALL_S="${STALL_S:-2400}"
MAX_ATTEMPTS="${MAX_ATTEMPTS:-10}"
setsid nohup bash scripts/experiments/supervise.sh /tmp/stage3.log "$STALL_S" "$MAX_ATTEMPTS" -- \
    python -u scripts/experiments/stage3_fleet.py \
    > /tmp/stage3_supervisor.log 2>&1 &
echo "fleet supervisor: pid $! (log /tmp/stage3.log)"

setsid nohup bash scripts/experiments/post_fleet_queue.sh \
    > /tmp/post_fleet.log 2>&1 &
echo "gate queue: pid $! (deadline $QUEUE_DEADLINE, log /tmp/post_fleet.log)"
