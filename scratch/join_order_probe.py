"""Is the bench's method-0-slower-than-method-2 join reading (guard ratio
1.38 in the a600 bench run; 1.05 the run before — method 0 does strictly
less work) a real cost or a measurement-order artifact? The bench always
times method 0 FIRST after the IVPQ build; this probe interleaves
m0,m2,m0,m2,... in one process so each method sees the same process state.
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
from postgres_word2vec_tpu.evaluation.benchutil import log  # noqa: E402
from postgres_word2vec_tpu.models.ivpq import (IVPQIndex,  # noqa: E402
                                               build_statistics)

N, D = 3_072_000, 300
NQ, NT = 5000, 100_000


def main():
    log(f"join_order_probe: devices={jax.devices()}")
    V = synth.generate_wordlike(jax.random.PRNGKey(0), N, D)
    np.asarray(V[0, 0])
    ivpq = IVPQIndex.build(jax.random.PRNGKey(3), V, m=30, k=32,
                           k_coarse=1024, coarse_positions=1,
                           train_size=100_000, iters=25, init="kmeans++")
    tgt = jnp.arange(NT, dtype=jnp.int32)
    qv = V[N - NQ:]
    stats = build_statistics(ivpq.cell_of, tgt, ivpq.num_cells)

    cfgs = {"m0": dict(alpha=200, method=0),
            "m2": dict(alpha=200, method=2, pvf=20, vectors=V)}
    # warm both compiled programs before ANY timing
    for kw in cfgs.values():
        _d, _i = ivpq.search_join(qv[:512], 5, tgt, statistics=stats,
                                  query_chunk=512, **kw)
        np.asarray(_i[..., :1])

    res = {k: [] for k in cfgs}
    for trial in range(4):
        for name, kw in cfgs.items():
            t0 = time.perf_counter()
            _d, _i = ivpq.search_join(qv, 5, tgt, statistics=stats,
                                      query_chunk=512, **kw)
            np.asarray(_i[..., :1])
            dt = time.perf_counter() - t0
            res[name].append(round(dt, 4))
            log(f"trial {trial} [{name}] {dt:.3f}s qps={NQ / dt:.0f}")

    out = {k: {"trials_s": v, "median_s": float(np.median(v)),
               "qps_median": NQ / float(np.median(v))} for k, v in res.items()}
    out["ratio_m0_over_m2"] = out["m0"]["median_s"] / out["m2"]["median_s"]
    with open("/root/repo/scratch/join_order_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
