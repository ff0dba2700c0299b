"""On-chip alpha sweep on v3 bench data: find the smallest alpha whose
method-2 PV join reaches recall@5 >= 0.92 at >= 7k QPS (VERDICT r3 item 2's
bar, restated on the harder v3 measuring stick). Candidates picked around
the committed bench points (a200 0.878 @ 9.3k, a400 0.909 @ 9.8k).
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from postgres_word2vec_tpu.evaluation import synth  # noqa: E402
from postgres_word2vec_tpu.evaluation.benchutil import (log,  # noqa: E402
                                                        recall_at_k)
from postgres_word2vec_tpu.models.exact import exact_top_k  # noqa: E402
from postgres_word2vec_tpu.models.ivpq import (IVPQIndex,  # noqa: E402
                                               build_statistics)

N, D = 3_072_000, 300
NQ, NT = 5000, 100_000


def main():
    log(f"join_alpha_probe: devices={jax.devices()}")
    t0 = time.perf_counter()
    V = synth.generate_wordlike(jax.random.PRNGKey(0), N, D)  # v3 defaults
    np.asarray(V[0, 0])
    log(f"v3 data in {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    ivpq = IVPQIndex.build(jax.random.PRNGKey(3), V, m=30, k=32,
                           k_coarse=1024, coarse_positions=1,
                           train_size=100_000, iters=25, init="kmeans++")
    log(f"IVPQ built in {time.perf_counter() - t0:.1f}s")
    tgt = jnp.arange(NT, dtype=jnp.int32)
    qv = V[N - NQ:]
    stats = build_statistics(ivpq.cell_of, tgt, ivpq.num_cells)
    _, gt_join = exact_top_k(qv[:256], V[:NT], 5, chunk_size=524288)
    gt_join = np.asarray(gt_join)

    res = {}
    for alpha in (400, 600, 800, 1200):
        kw = dict(alpha=alpha, method=2, pvf=20, vectors=V)
        _d, _i = ivpq.search_join(qv[:512], 5, tgt, statistics=stats,
                                  query_chunk=512, **kw)
        np.asarray(_i[..., :1])
        t0 = time.perf_counter()
        _d, _i = ivpq.search_join(qv, 5, tgt, statistics=stats,
                                  query_chunk=512, **kw)
        np.asarray(_i[..., :1])
        dt = time.perf_counter() - t0
        _, i2, info = ivpq.search_join(qv[:256], 5, tgt, statistics=stats,
                                       query_chunk=512, return_info=True,
                                       **kw)
        res[f"pv_a{alpha}"] = {
            "total_s": dt, "qps": NQ / dt,
            "recall5": float(recall_at_k(i2, gt_join)),
            "scanned_rows_mean": float(np.asarray(info["retrieved"]).mean()),
            "rounds": int(np.asarray(info["rounds"]).max()),
            "final_alpha": int(np.asarray(info["final_alpha"]).max())}
        log(f"[pv_a{alpha}] {dt:.3f}s qps={NQ / dt:.0f} "
            f"recall@5={res[f'pv_a{alpha}']['recall5']:.3f} "
            f"scanned~{res[f'pv_a{alpha}']['scanned_rows_mean']:.0f}")

    with open("/root/repo/scratch/join_alpha_probe.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
