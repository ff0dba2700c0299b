#!/usr/bin/env python3
"""On-chip A/B probe for the two round-4b changes, at bench shapes:

1. PQ PV shortlist: exact wide-row top-(k·pvf) vs the approx
   partial-reduce shortlist (binned scan + approx_min_k), end-to-end
   through PQIndex.search_pv on a 3M synthetic table (v3 calibration).
2. IVPQ join chunk pipelining: search_join at 5k×100k, α=200, method 2
   (whose chunk syncs previously serialized ~4 tunnel RTTs per chunk).

Writes scratch/r4b_ab_probe.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(
                      os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from postgres_word2vec_tpu.evaluation import synth
from postgres_word2vec_tpu.evaluation.benchutil import (host_exact_topk, log,
                                                        recall_at_k, timeit)
from postgres_word2vec_tpu.models.ivpq import IVPQIndex
from postgres_word2vec_tpu.models.pq import PQIndex

N = 3_072_000
D = 300
OUT = {}


def main():
    t0 = time.perf_counter()
    v = synth.generate_wordlike(jax.random.PRNGKey(0), N, D)
    vn = np.asarray(v)
    log(f"table {time.perf_counter() - t0:.1f}s")

    # ---------------- 1. PV shortlist A/B (12x256, B=64 and 256) --------
    pq = PQIndex.build(jax.random.PRNGKey(7), v, m=12, k=256,
                       train_size=100_000, iters=25, init="kmeans++")
    q_eval = v[:256]
    gt10 = host_exact_topk(vn[:256], [vn], 10)[1]
    for B in (64, 256):
        qb = v[:B]
        row = {}
        for sl in ("exact", "approx"):
            t, _ = timeit(lambda q, sl=sl: pq.search_pv(
                q, 10, 20, v, shortlist=sl), qb)
            _, ids = pq.search_pv(q_eval, 10, 20, v, shortlist=sl)
            row[sl] = dict(per_query_ms=t / B * 1e3,
                           recall10=recall_at_k(np.asarray(ids), gt10))
            log(f"pv B={B} {sl}: {row[sl]['per_query_ms']:.3f} ms/q "
                f"r@10={row[sl]['recall10']:.4f}")
        OUT[f"pv_B{B}"] = row
    del pq

    # ---------------- 2. join pipelining (5k x 100k, a=200, m2) ---------
    ivpq = IVPQIndex.build(jax.random.PRNGKey(9), v, m=30, k=32,
                           k_coarse=32, train_size=100_000, iters=10)
    rngq = np.random.default_rng(3)
    tsel = np.sort(rngq.choice(N, 100_000, replace=False)).astype(np.int32)
    targets = jnp.asarray(tsel)
    queries = v[1_000_000:1_005_000]
    gt_j = {}
    # join ground truth: exact over the target subset
    sub = vn[tsel]
    qh = vn[1_000_000:1_005_000]
    d2 = None
    kw = dict(vectors=v, alpha=200, pvf=20, method=2, confidence=0.8)
    warm = ivpq.search_join(queries, 5, targets, **kw)
    jax.block_until_ready(warm[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        vals, ids = ivpq.search_join(queries, 5, targets, **kw)
        np.asarray(vals[:4])
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    OUT["join_pv_a200"] = dict(total_s=med, qps=5000 / med, runs=ts)
    log(f"join a200 m2: {med:.3f}s ({5000 / med:.0f} QPS) runs={ts}")

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "r4b_ab_probe.json"), "w") as f:
        json.dump(OUT, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
