#!/bin/bash
# Round-5 TPU queue #3 (post-restart): measure the PIPELINED serve path
# (commits 01c6cef/bb1c158 landed after the last serving run), then the
# on-chip kernel tests. Sequential — one process owns the chip.
set -u
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*"; }

log "=== 1/2 serving sweep r5 (pipelined /knn path) ==="
timeout 5400 python evaluation/serving_bench.py --n 3072000 --clients 64 \
  --seconds 20 --repeats 3 --families exact,pq_pv,ivfadc_pv \
  --server async --client raw --echo-floor \
  --out reports/serving_3M_r5.json > /tmp/serving_r5c.log 2>&1
log "serving exit=$?"
grep -E "trial|echo|warm in|engine up" /tmp/serving_r5c.log | tail -14

log "=== 2/2 TPU kernel tests ==="
timeout 2400 env PW2V_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q \
  > /tmp/tpu_kernels_r5c.log 2>&1
log "kernels exit=$?"
tail -2 /tmp/tpu_kernels_r5c.log

log "=== queue3 done ==="
