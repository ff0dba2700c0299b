"""On-chip microbench isolating the r2->r3 PQ scan-family timing delta.

Data-independent: random codes + random LUTs at bench shapes (3M rows).
Run once from the HEAD checkout and once from the feedff6 worktree:

    python scratch/kernel_bisect.py HEAD
    (cd .wt_r2 && python ../scratch/kernel_bisect.py R2)

Timing = enqueue, then materialize a small slice (CLAUDE.md: the only
reliable completion barrier on the tunnel).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

TAG = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
N = 3_072_000
BLOCK_N = 2048


def timeit(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][..., :1])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0][..., :1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(np.min(ts)), float(np.max(ts))


def main():
    from postgres_word2vec_tpu.ops import pallas_kernels as pk
    print(f"[{TAG}] devices={jax.devices()}", file=sys.stderr, flush=True)
    results = {"tag": TAG}
    key = jax.random.PRNGKey(0)

    for (m, k, B) in [(12, 256, 64), (12, 256, 256), (60, 16, 256)]:
        pad = (-N) % BLOCK_N
        codes = jax.random.randint(key, (m, N + pad), 0, k, jnp.int32
                                   ).astype(jnp.uint8)
        luts = jax.random.uniform(key, (B, m, k), jnp.float32)
        jax.block_until_ready((codes, luts))
        name = f"m{m}k{k}B{B}"

        # 1. raw dense scan (writes (B, N) f32)
        t, lo, hi = timeit(
            lambda l, c: pk.adc_scan_pallas(l, c, block_n=BLOCK_N), luts,
            codes)
        results[f"scan_{name}"] = dict(med_ms=t * 1e3, min_ms=lo * 1e3,
                                       max_ms=hi * 1e3, per_q_ms=t / B * 1e3)
        print(f"[{TAG}] scan_{name}: {t*1e3:.1f} ms ({t/B*1e3:.3f} ms/q)",
              file=sys.stderr, flush=True)

        # 2. scan + exact top-k (what bench's pq_scan measures, approx=False)
        t, lo, hi = timeit(
            lambda l, c: pk.adc_top_k_pallas(l, c, 10, valid_n=N,
                                             block_n=BLOCK_N, approx=False),
            luts, codes)
        results[f"topk_exact_{name}"] = dict(med_ms=t * 1e3, min_ms=lo * 1e3,
                                             max_ms=hi * 1e3,
                                             per_q_ms=t / B * 1e3)
        print(f"[{TAG}] topk_exact_{name}: {t*1e3:.1f} ms "
              f"({t/B*1e3:.3f} ms/q)", file=sys.stderr, flush=True)

        # 3. scan + k*pvf=200 exact top-k (the PV shortlist shape)
        t, lo, hi = timeit(
            lambda l, c: pk.adc_top_k_pallas(l, c, 200, valid_n=N,
                                             block_n=BLOCK_N, approx=False),
            luts, codes)
        results[f"topk200_{name}"] = dict(med_ms=t * 1e3, per_q_ms=t / B * 1e3)
        print(f"[{TAG}] topk200_{name}: {t*1e3:.1f} ms ({t/B*1e3:.3f} ms/q)",
              file=sys.stderr, flush=True)

        # 4. plain lax.top_k on a precomputed (B, N) buffer — the r2
        # formulation's top-k stage, isolated.
        dists = pk.adc_scan_pallas(luts, codes, block_n=BLOCK_N)
        jax.block_until_ready(dists)

        @jax.jit
        def plain_topk(d):
            neg, idx = lax.top_k(-d, 10)
            return -neg, idx

        t, lo, hi = timeit(plain_topk, dists)
        results[f"plain_laxtopk_{name}"] = dict(med_ms=t * 1e3,
                                                per_q_ms=t / B * 1e3)
        print(f"[{TAG}] plain_laxtopk_{name}: {t*1e3:.1f} ms",
              file=sys.stderr, flush=True)
        del dists, codes, luts

    out = json.dumps(results)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"kernel_bisect_{TAG}.json")
    with open(path, "w") as f:
        f.write(out)
    print(out, flush=True)


if __name__ == "__main__":
    main()
