#!/bin/bash
# Round-4 queue, stage C: drains the jobs stages A/B never reached before
# the box recycle (tunnel returned 2026-08-19).  Priority order: the
# norm-stats A/B (can flip the shipped default), PTI occupancy, remat A/B,
# then the two envelope rows.  Each job persists its JSON rows into docs/
# immediately so a mid-queue box loss keeps what ran.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

wait_tunnel() {
  for i in $(seq 1 40); do
    if timeout 150 python -c "import jax; assert jax.default_backend()=='tpu'" >/dev/null 2>&1; then
      echo "tunnel up after $i probes at $(date)"
      return 0
    fi
    echo "probe $i: tunnel down at $(date)"
    sleep 60
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

persist() {  # srclog dst
  grep -h '^{' "$1" > "$2" 2>/dev/null
  [ -s "$2" ] || rm -f "$2"
}

run_job norm_stats /tmp/r4c_norm.log timeout 3000 python tools/run_norm_stats_ab.py
persist /tmp/r4c_norm.log docs/norm_stats_ab_v5e.jsonl

run_job pti /tmp/r4c_pti.log timeout 3000 \
  python tools/run_pti_probe.py --batches 32 64 128
persist /tmp/r4c_pti.log docs/pti_probe_v5e.jsonl

run_job remat /tmp/r4c_remat.log timeout 3600 python tools/run_remat_ab.py
persist /tmp/r4c_remat.log docs/remat_ab_v5e.jsonl

run_job ddim /tmp/r4c_ddim.log timeout 3000 python tools/conv_roofline.py \
  --mode ddim --batch 8 --budget-s 2400 \
  --json docs/conv_roofline_v5e_ddim_b8.json

run_job itemize8 /tmp/r4c_itemize8.log timeout 1800 \
  python tools/train_step_itemize.py --batch 8 --json docs/train_itemize_b8.json

# Gated default flip: only on a clean >1% one_pass win at both batches,
# with numerics tests re-run green (see tools/flip_norm_stats_default.py).
python tools/flip_norm_stats_default.py --log /tmp/r4c_norm.log || true

echo "=== r4c queue drained at $(date) ==="
