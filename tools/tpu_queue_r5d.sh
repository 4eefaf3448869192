#!/bin/bash
# Round-5 stage D: roofline artifacts for the SHIPPED programs (run serially
# on the 1x v5e tunnel, after bench.py has released the chip).
#
# 1. ddim_b8      — the artifact bench.py:859-864 looks for and VERDICT #6 asked for
# 2. infer_b8 s2d=true     — price the shipped infer-b8 conv program (auto -> True)
# 3. train_b8 s2d=encoder  — price the shipped train-b8 conv program (auto -> encoder)
#
# persist(): docs/ is written ONLY when the job exits 0 (advisor r4 rule).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run_job() {  # name, timeout_s, args...
    local name="$1" tmo="$2"; shift 2
    local tmp="/tmp/r5d_${name}.json"
    echo "=== $name ($(date -u +%H:%M:%S)) ==="
    if timeout "$tmo" python tools/conv_roofline.py "$@" --json "$tmp"; then
        cp "$tmp" "docs/conv_roofline_v5e_${name}.json"
        echo "=== $name OK -> docs/conv_roofline_v5e_${name}.json"
    else
        echo "=== $name FAILED rc=$? (tmp kept at $tmp; docs/ untouched)"
    fi
}

run_job ddim_b8 1500 --mode ddim --batch 8 --budget-s 700 --probe-timeout 120
run_job infer_b8_s2d 1200 --mode inference --batch 8 --s2d true --budget-s 600 --probe-timeout 120
run_job train_b8_s2d_enc 1800 --mode train --batch 8 --s2d encoder --budget-s 900 --probe-timeout 120
