#!/bin/bash
# Round-5 TPU queue #2: re-runs after the capacity-insert fix + join
# recall ladder + serving diagnostics, then the 10M-target join.
set -u
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*"; }

log "=== 1/4 full bench re-run (3M: insert fix + a2400/pvf50 rows) ==="
timeout 7200 python bench.py > /tmp/bench_full_r5b.log 2>&1
log "bench exit=$?"
tail -2 /tmp/bench_full_r5b.log

log "=== 2/4 serving sweep r5 retry (diagnostics in) ==="
timeout 5400 python evaluation/serving_bench.py --n 3072000 --clients 64 \
  --seconds 20 --repeats 3 --families exact,pq_pv,ivfadc_pv \
  --server async --client raw --echo-floor \
  --out reports/serving_3M_r5.json > /tmp/serving_r5b.log 2>&1
log "serving exit=$?"
grep -E "trial|echo|batcher|zero" /tmp/serving_r5b.log | tail -12

log "=== 3/4 step_wise stage breakdown retry ==="
timeout 5400 python evaluation/step_wise_time_measurement.py \
  evaluation/config/step_wise_3M.json > /tmp/step_wise_r5b.log 2>&1
log "step_wise exit=$?"
tail -3 /tmp/step_wise_r5b.log

log "=== 4/4 10M-target join ==="
timeout 10800 python evaluation/scale_join_10M.py \
  > /tmp/scale_join_10M.log 2>&1
log "scale_join exit=$?"
grep -E "^\[|exact_bf16|ivpq_join" /tmp/scale_join_10M.log | tail -8

log "=== queue2 done ==="
