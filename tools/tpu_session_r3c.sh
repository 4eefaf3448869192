#!/bin/bash
# Round-3 TPU session, part 3: rooflines (scaled-measurement fallback) + smokes.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "== conv roofline train b64 =="
timeout 9000 python tools/conv_roofline.py --mode train --batch 64 --top 25 \
    --json docs/conv_roofline_v5e_train_b64.json > /tmp/roofline_b64.log 2>&1
echo "rc=$?" >> /tmp/roofline_b64.log

echo "== conv roofline train b128 =="
timeout 9000 python tools/conv_roofline.py --mode train --batch 128 --top 25 \
    --json docs/conv_roofline_v5e_train_b128.json > /tmp/roofline_b128.log 2>&1
echo "rc=$?" >> /tmp/roofline_b128.log

echo "== b128 trainer epoch smoke =="
timeout 3600 python tools/smoke_trainer_b128.py > /tmp/trainer_b128.log 2>&1
echo "rc=$?" >> /tmp/trainer_b128.log

echo "== flagship LDM smoke =="
timeout 5400 python tools/smoke_flagship_ldm.py > /tmp/ldm_smoke.log 2>&1
echo "rc=$?" >> /tmp/ldm_smoke.log

echo "session done"
