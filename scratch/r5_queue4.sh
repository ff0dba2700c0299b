#!/bin/bash
# Round-5 TPU queue #4: interactive-regime join sweep (owed since 60266a9)
# then the full 3M bench at HEAD (repopulates .jax_cache for the driver's
# end-of-round run). Sequential; launch only when the chip is free.
set -u
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*"; }

log "=== 1/2 join nq sweep (3M, interactive regime) ==="
timeout 7200 python evaluation/join_nq_sweep.py > /tmp/join_nq_sweep.log 2>&1
log "nq sweep exit=$?"
tail -3 /tmp/join_nq_sweep.log

log "=== 2/2 full 3M bench at HEAD ==="
timeout 7200 python bench.py > /tmp/bench_full_r5d.log 2>&1
log "bench exit=$?"
tail -2 /tmp/bench_full_r5d.log

log "=== queue4 done ==="
