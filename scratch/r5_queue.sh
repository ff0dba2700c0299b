#!/bin/bash
# Round-5 sequential TPU queue: one job at a time (only one process may
# hold the chip). Detached; poll /tmp/r5_queue.log. Generous timeouts —
# killing mid-compile wedges the tunnel (CLAUDE.md).
set -u
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*"; }

log "=== 1/4 full bench (3M) ==="
timeout 7200 python bench.py > /tmp/bench_full_r5.log 2>&1
log "bench exit=$? (tail below)"
tail -3 /tmp/bench_full_r5.log

log "=== 2/4 serving sweep r5 (64 clients, async server) ==="
timeout 5400 python evaluation/serving_bench.py --n 3072000 --clients 64 \
  --seconds 20 --repeats 3 --families exact,pq_pv,ivfadc_pv \
  --server async --client raw --echo-floor \
  --out reports/serving_3M_r5.json > /tmp/serving_r5.log 2>&1
log "serving exit=$? (tail below)"
tail -3 /tmp/serving_r5.log

log "=== 3/4 step_wise stage breakdown (3M, warm protocol) ==="
timeout 5400 python evaluation/step_wise_time_measurement.py \
  evaluation/config/step_wise_3M.json > /tmp/step_wise_r5.log 2>&1
log "step_wise exit=$?"
tail -3 /tmp/step_wise_r5.log

log "=== 4/4 TPU kernel tests ==="
timeout 2400 env PW2V_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q \
  > /tmp/tpu_kernels_r5.log 2>&1
log "kernels exit=$?"
tail -2 /tmp/tpu_kernels_r5.log

log "=== queue done ==="
