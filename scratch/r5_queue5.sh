#!/bin/bash
# Round-5 TPU queue #5 (post-reboot): repopulate .jax_cache + owed reports.
# 1. full 3M bench at HEAD (headline + cache)
# 2. fresh serving run at HEAD (deepened pipeline, tuned window/depth)
# 3. interactive-regime join nq sweep (owed since 60266a9)
set -u
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*"; }

log "=== 1/3 full 3M bench at HEAD ==="
timeout 7200 python bench.py > /tmp/bench_full_r5e.log 2>&1
log "bench exit=$?"
tail -2 /tmp/bench_full_r5e.log

log "=== 2/3 serving bench at HEAD ==="
timeout 5400 python evaluation/serving_bench.py \
  --window-ms 4.0 --depth 6 --repeats 3 \
  --out reports/serving_3M_r5b.json > /tmp/serving_r5b.log 2>&1
log "serving exit=$?"
tail -3 /tmp/serving_r5b.log

log "=== 3/3 join nq sweep (3M, interactive regime) ==="
timeout 7200 python evaluation/join_nq_sweep.py > /tmp/join_nq_sweep.log 2>&1
log "nq sweep exit=$?"
tail -3 /tmp/join_nq_sweep.log

log "=== queue5 done ==="
