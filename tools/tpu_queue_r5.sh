#!/bin/bash
# Round-5 roofline re-baseline queue (run serially on the 1x v5e tunnel).
#
# Each job is bounded (--budget-s caps the per-shape microbench phase; the
# run still finishes with an honest JSON recording what was extrapolated).
# persist(): output lands in docs/ ONLY when the job exits 0 — partial rows
# from failed runs stay in /tmp (advisor r4: persist must not overwrite
# docs/ with partial rows).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run_job() {  # name, timeout_s, args...
    local name="$1" tmo="$2"; shift 2
    local tmp="/tmp/r5_${name}.json"
    echo "=== $name ($(date -u +%H:%M:%S)) ==="
    if timeout "$tmo" python tools/conv_roofline.py "$@" --json "$tmp"; then
        cp "$tmp" "docs/conv_roofline_v5e_${name}.json"
        echo "=== $name OK -> docs/conv_roofline_v5e_${name}.json"
    else
        echo "=== $name FAILED rc=$? (tmp kept at $tmp; docs/ untouched)"
    fi
}

# 1. inference b8 under the shipped one_pass default — the >=95% target row
run_job infer_b8 1800 --mode inference --batch 8 --budget-s 900 --probe-timeout 120

# 2. the missing DDIM roofline (bench.py:836 looks for this exact file)
run_job ddim_b8 1800 --mode ddim --batch 8 --budget-s 900 --probe-timeout 120

# 3. LDM train-step conv floor (pairs with docs/diffusion_hbm_model_b8.json)
run_job diffusion_b8 1800 --mode diffusion --batch 8 --budget-s 900 --probe-timeout 120

# 4. train b8 re-baseline under one_pass
run_job train_b8 2400 --mode train --batch 8 --budget-s 1200 --probe-timeout 120
