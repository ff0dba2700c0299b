"""On-chip A/B: is the r2->r4 IVPQ join QPS delta (7485 -> ~4400-5300 at
alpha=200 method 2) the v3 dataset recalibration or a code change?

Runs the bench's exact join workload at HEAD on V2-PARAMETER data
(group=8, sigma_v=0.55, fringe off — the synth defaults at the round-2
bench commit feedff6). If HEAD-on-v2 reproduces ~r2 QPS/recall, the delta
is the measuring stick; if not, round-3/4 code slowed the join.
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import os
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
    log(f"join_v2_probe: devices={jax.devices()}")
    t0 = time.perf_counter()
    V = synth.generate_wordlike(jax.random.PRNGKey(0), N, D,
                                **synth.V2_PARAMS)
    np.asarray(V[0, 0])
    log(f"v2-parameter data in {time.perf_counter() - t0:.1f}s")

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
    for name, kw in (
            ("adc_a200", dict(alpha=200, method=0)),
            ("pv_a200", dict(alpha=200, method=2, pvf=20, vectors=V)),
    ):
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
        res[name] = {
            "total_s": dt, "qps": NQ / dt,
            "recall5": float(recall_at_k(i2, gt_join)),
            "scanned_rows_mean": float(np.asarray(info["retrieved"]).mean()),
            "rounds": int(np.asarray(info["rounds"]).max()),
            "final_alpha": int(np.asarray(info["final_alpha"]).max())}
        log(f"[{name}] {dt:.3f}s qps={NQ / dt:.0f} "
            f"recall@5={res[name]['recall5']:.3f} "
            f"rounds={res[name]['rounds']} "
            f"scanned~{res[name]['scanned_rows_mean']:.0f}")

    with open("/root/repo/scratch/join_v2_probe.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
