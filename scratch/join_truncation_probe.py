"""Bench-shape (alpha=200, method=2, T=100k, flat-1024 coarse) budget-vs-
dense join recall probe on CPU — is the default tile budget truncating?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from postgres_word2vec_tpu.evaluation import synth
from postgres_word2vec_tpu.models.ivpq import IVPQIndex, build_statistics
from postgres_word2vec_tpu.models.exact import exact_top_k

N, D = 120_000, 300
NT, NQ = 100_000, 256
K = 5

t0 = time.perf_counter()
V = synth.generate_wordlike(jax.random.PRNGKey(0), N, D)
print(f"data {time.perf_counter()-t0:.1f}s")

t0 = time.perf_counter()
ivpq = IVPQIndex.build(jax.random.PRNGKey(3), V, m=30, k=32, k_coarse=1024,
                       coarse_positions=1, train_size=100_000, iters=25,
                       init="kmeans++")
print(f"build {time.perf_counter()-t0:.1f}s")

tgt = jnp.arange(NT, dtype=jnp.int32)
qv = V[N - NQ:]
stats = build_statistics(ivpq.cell_of, tgt, ivpq.num_cells)
_, gt = exact_top_k(qv, V[:NT], K)
gt = np.asarray(gt)


def recall(ids):
    ids = np.asarray(ids)
    return sum(len(set(a.tolist()) & set(e.tolist()))
               for a, e in zip(ids, gt)) / gt.size


kw = dict(statistics=stats, alpha=200, method=2, confidence=0.8, pvf=20,
          vectors=V, query_chunk=256)
for name, extra in [("dense", dict(impl="dense")),
                    ("budget_default", dict(impl="budget")),
                    ("budget_x4", dict(impl="budget", budget_tiles=64)),
                    ("budget_x16", dict(impl="budget", budget_tiles=256))]:
    t0 = time.perf_counter()
    _, ids, info = ivpq.search_join(qv, K, tgt, return_info=True, **kw,
                                    **extra)
    dt = time.perf_counter() - t0
    r = recall(ids)
    sc = float(np.asarray(info["retrieved"]).mean())
    print(f"{name:16s} recall@5={r:.4f} scanned~{sc:.0f} "
          f"rounds={info['rounds']} final_alpha={info['final_alpha']} "
          f"t={dt:.1f}s", flush=True)
