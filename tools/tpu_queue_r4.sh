#!/bin/bash
# Round-4 TPU measurement queue: tunnel-gated, serialized, one retry per job.
#
# Replaces the round-3 /tmp/rq4.sh + /tmp/rq5.sh (kill those by PID before
# launching this — concurrent TPU clients contend and corrupt timings).
# Launch:  bash tools/tpu_queue_r4.sh > /tmp/r4q_main.log 2>&1 &
#          echo $! > /tmp/r4q.pid
#
# Jobs (VERDICT r3 tasks 2/3/5/7, priority order):
#  1. full bench.py            — validates the probe refactor on hardware
#  2. train_step_itemize b128  — decompose the 143 ms non-floor step time
#  3. conv_roofline train b128 — replace the coarse >=55.3% extrapolated bound
#  4. conv_roofline ddim       — the sampler's per-conv envelope row
#  5. train_step_itemize b8    — the b8 roofline-gap companion
#  6. run_pti_probe 32/64/128  — PTI occupancy bracketing
#  7. run_remat_ab             — remat tax @b128 + b192/b256 unlock + PTI remat
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

wait_tunnel() {
  for i in $(seq 1 400); do
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

run_job bench /tmp/r4q_bench.log timeout 5400 python bench.py
run_job itemize128 /tmp/r4q_itemize128.log timeout 3600 \
  python tools/train_step_itemize.py --batch 128 --json docs/train_itemize_b128.json
run_job train128 /tmp/r4q_train128.log timeout 5400 python tools/conv_roofline.py \
  --mode train --batch 128 --budget-s 4200 \
  --json docs/conv_roofline_v5e_train_b128_full.json
run_job ddim /tmp/r4q_ddim.log timeout 5400 python tools/conv_roofline.py \
  --mode ddim --batch 8 --budget-s 3600 \
  --json docs/conv_roofline_v5e_ddim_b8.json
run_job itemize8 /tmp/r4q_itemize8.log timeout 2400 \
  python tools/train_step_itemize.py --batch 8 --json docs/train_itemize_b8.json
run_job pti /tmp/r4q_pti.log timeout 3600 \
  python tools/run_pti_probe.py --batches 32 64 128
run_job remat /tmp/r4q_remat.log timeout 5400 python tools/run_remat_ab.py
echo "=== r4 queue drained at $(date) ==="
