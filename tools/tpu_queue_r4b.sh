#!/bin/bash
# Round-4 queue, stage B: chained after tools/tpu_queue_r4.sh (waits on its
# PID file), runs the norm-stats A/B added mid-round, and persists the
# stage-A jobs' JSON rows from /tmp logs into docs/ so the end-of-round
# commit captures them.
# Launch:  bash tools/tpu_queue_r4b.sh > /tmp/r4qb_main.log 2>&1 &
#          echo $! > /tmp/r4qb.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# Wait for stage A to drain (never run two TPU clients concurrently).
# Check the cmdline too: a recycled PID must not wedge the wait forever.
if [ -f /tmp/r4q.pid ]; then
  A=$(cat /tmp/r4q.pid)
  while kill -0 "$A" 2>/dev/null \
        && ps -p "$A" -o cmd= 2>/dev/null | grep -q tpu_queue_r4.sh; do
    sleep 60
  done
  echo "stage A (pid $A) drained at $(date)"
fi

wait_tunnel() {
  for i in $(seq 1 200); do
    if timeout 150 python -c "import jax; assert jax.default_backend()=='tpu'" >/dev/null 2>&1; then
      echo "tunnel up after $i probes at $(date)"
      return 0
    fi
    echo "probe $i: tunnel down at $(date)"
    sleep 90
  done
  return 1
}

run_job() {  # name logfile cmd...
  local name=$1 log=$2; shift 2
  for attempt in 1 2; do
    wait_tunnel || { echo "=== $name: tunnel never came up ==="; return 1; }
    "$@" > "$log" 2>&1
    local rc=$?
    echo "=== $name attempt $attempt rc=$rc at $(date) ==="
    [ $rc -eq 0 ] && return 0
    tail -3 "$log"
  done
  return 1
}

run_job norm_stats /tmp/r4qb_norm.log timeout 5400 python tools/run_norm_stats_ab.py

# Flip the shipped default to one_pass only on a clean measured win at both
# batches (the script re-runs the numerics tests and commits; no-ops
# otherwise — see tools/flip_norm_stats_default.py).
python tools/flip_norm_stats_default.py --log /tmp/r4qb_norm.log || true

# Persist stage-A and stage-B JSON rows (logs die with the box; docs/ is
# committed by the end-of-round snapshot).
grep -h '^{' /tmp/r4qb_norm.log  > docs/norm_stats_ab_v5e.jsonl 2>/dev/null
grep -h '^{' /tmp/r4q_pti.log    > docs/pti_probe_v5e.jsonl     2>/dev/null
grep -h '^{' /tmp/r4q_remat.log  > docs/remat_ab_v5e.jsonl      2>/dev/null
for f in docs/norm_stats_ab_v5e.jsonl docs/pti_probe_v5e.jsonl docs/remat_ab_v5e.jsonl; do
  [ -s "$f" ] || rm -f "$f"
done
echo "=== r4b queue drained at $(date) ==="
