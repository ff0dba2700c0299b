#!/bin/bash
# Sequential TPU job queue for round 4 tail (one TPU holder at a time).
cd /root/repo
TPID=$(cat /tmp/tradeoff.pid 2>/dev/null)
while [ -n "$TPID" ] && kill -0 "$TPID" 2>/dev/null; do sleep 30; done
echo "=== tradeoff done, starting alpha probe $(date)" >> /tmp/r4_queue.log
timeout 3600 python scratch/join_alpha_probe.py > /tmp/alpha_probe.log 2>&1
echo "=== alpha probe rc=$? $(date)" >> /tmp/r4_queue.log
timeout 3600 python evaluation/serving_bench.py --clients 64 --seconds 20 \
  --families exact,pq,pq_pv,ivfadc,ivfadc_pv --repeats 3 \
  --out reports/serving_3M_r4.json > /tmp/serving_r4.log 2>&1
echo "=== serving rc=$? $(date)" >> /tmp/r4_queue.log
