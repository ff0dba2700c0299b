#!/usr/bin/env python3
"""R5 probe: prepared-join QPS vs exact at 1M/3M targets on the real chip.

Measures (a) prepare_join build time, (b) prepared search_join wall across
query_chunk sizes (dispatch-count ladder), (c) ad-hoc control, (d) recall
per alpha, (e) exact baselines. Output: JSON lines to stdout.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from postgres_word2vec_tpu.evaluation import synth
from postgres_word2vec_tpu.evaluation.benchutil import log, recall_at_k
from postgres_word2vec_tpu.models.ivpq import IVPQIndex, build_statistics
from postgres_word2vec_tpu.models.exact import exact_top_k
import json

N, D = 3_072_000, 300
t0 = time.perf_counter()
V = synth.generate_wordlike(jax.random.PRNGKey(0), N, D)
np.asarray(V[0, 0])
log(f"data in {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
ivpq = IVPQIndex.build(jax.random.PRNGKey(3), V, m=30, k=32, k_coarse=1024,
                       coarse_positions=1, train_size=100_000, iters=25,
                       init="kmeans++")
log(f"ivpq built in {time.perf_counter()-t0:.1f}s")
qv = V[N - 5000:]
rows = []
for nt, tag in ((1_000_000, "1M"), (N, "3M")):
    tgt = jnp.arange(nt, dtype=jnp.int32)
    stats = build_statistics(ivpq.cell_of, tgt, ivpq.num_cells)
    t0 = time.perf_counter()
    ph = ivpq.prepare_join(tgt, vectors=V if nt == N else V[:nt],
                           vecs_pregathered=True)
    prep = time.perf_counter() - t0
    log(f"[{tag}] prepare_join {prep:.3f}s")
    _, gt = exact_top_k(qv[:256], V[:nt], 5, chunk_size=524288)
    gt = np.asarray(gt)
    # exact full-scan baseline wall (f32) over the 5k queries
    for s in (0, 512):
        _, i = exact_top_k(qv[s:s + 512], V[:nt], 5, chunk_size=524288)
        np.asarray(i[..., :1])
    t0 = time.perf_counter()
    for s in range(0, 5000, 512):
        qb = qv[s:s + 512] if s + 512 <= 5000 else qv[4488:5000]
        _, i = exact_top_k(qb[:512], V[:nt], 5, chunk_size=524288)
    np.asarray(i[..., :1])
    ex = time.perf_counter() - t0
    log(f"[{tag}] exact f32 {ex:.3f}s qps={5000/ex:.0f}")
    rows.append({"tag": tag, "row": "exact", "total_s": ex,
                 "qps": 5000 / ex, "prep_s": prep})
    for alpha in (200, 600, 1200):
        kwb = dict(prepared=ph, statistics=stats, alpha=alpha, method=2,
                   pvf=20, confidence=0.8)
        _, ie, info = ivpq.search_join(qv[:256], 5, query_chunk=256,
                                       return_info=True, **kwb)
        rec = recall_at_k(np.asarray(ie), gt)
        for qc in (512, 2048, 5000):
            kw = dict(kwb, query_chunk=qc)
            d, i = ivpq.search_join(qv, 5, **kw)
            np.asarray(i[..., :1])
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                d, i = ivpq.search_join(qv, 5, **kw)
                np.asarray(i[..., :1])
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts))
            scanned = float(np.asarray(info["retrieved"]).mean())
            log(f"[{tag}] a{alpha} qc{qc}: {dt:.3f}s qps={5000/dt:.0f} "
                f"recall@5={rec:.3f} scanned~{scanned:.0f}")
            rows.append({"tag": tag, "row": f"prep_a{alpha}_qc{qc}",
                         "total_s": dt, "qps": 5000 / dt, "recall5": rec,
                         "scanned": scanned,
                         "trials": [round(t, 4) for t in ts]})
    # ad-hoc control at alpha=600 (per-call gathers + tile cache)
    kw = dict(target_ids=tgt, vectors=V, statistics=stats, alpha=600,
              method=2, pvf=20, confidence=0.8)
    d, i = ivpq.search_join(qv, 5, **kw)
    np.asarray(i[..., :1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        d, i = ivpq.search_join(qv, 5, **kw)
        np.asarray(i[..., :1])
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    log(f"[{tag}] adhoc a600: {dt:.3f}s qps={5000/dt:.0f}")
    rows.append({"tag": tag, "row": "adhoc_a600", "total_s": dt,
                 "qps": 5000 / dt, "trials": [round(t, 4) for t in ts]})
    del ph

print(json.dumps(rows))
with open("/root/repo/scratch/r5_join_probe.json", "w") as f:
    json.dump(rows, f, indent=1)
