#!/bin/bash
# Round-3 TPU measurement session: kernel A/Bs -> bench -> conv rooflines.
# Run on the machine with the tunneled TPU, with the CPU otherwise idle
# (host contention inflates chained-dispatch timings).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "== attention microbench =="
timeout 2400 python tools/kernel_microbench.py --only attention \
    > /tmp/kmb_attn.log 2>&1
echo "rc=$?" >> /tmp/kmb_attn.log

echo "== groupnorm microbench =="
timeout 3600 python tools/kernel_microbench.py --only groupnorm \
    > /tmp/kmb_gn.log 2>&1
echo "rc=$?" >> /tmp/kmb_gn.log

echo "== train-step kernel A/B =="
timeout 5400 python tools/kernel_microbench.py --only trainstep --iters 20 \
    > /tmp/kmb_step.log 2>&1
echo "rc=$?" >> /tmp/kmb_step.log

echo "== full bench =="
timeout 7200 python bench.py > /tmp/bench_r3.log 2>&1
echo "rc=$?" >> /tmp/bench_r3.log

echo "== conv roofline train b64 =="
timeout 5400 python tools/conv_roofline.py --mode train --batch 64 --top 25 \
    --json docs/conv_roofline_v5e_train_b64.json > /tmp/roofline_b64.log 2>&1
echo "rc=$?" >> /tmp/roofline_b64.log

echo "== conv roofline train b128 =="
timeout 7200 python tools/conv_roofline.py --mode train --batch 128 --top 25 \
    --json docs/conv_roofline_v5e_train_b128.json > /tmp/roofline_b128.log 2>&1
echo "rc=$?" >> /tmp/roofline_b128.log

echo "== b128 trainer epoch smoke =="
timeout 3600 python tools/smoke_trainer_b128.py > /tmp/trainer_b128.log 2>&1
echo "rc=$?" >> /tmp/trainer_b128.log

echo "== flagship LDM smoke =="
timeout 5400 python tools/smoke_flagship_ldm.py > /tmp/ldm_smoke.log 2>&1
echo "rc=$?" >> /tmp/ldm_smoke.log

echo "session done"
