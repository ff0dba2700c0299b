"""Recheck the m60k16 scan at HEAD + verify the top-k fix on-chip."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

N, BLOCK_N = 3_072_000, 2048


def timeit(fn, *args, iters=7):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][..., :1])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0][..., :1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), [round(t * 1e3, 1) for t in ts]


from postgres_word2vec_tpu.ops import pallas_kernels as pk

key = jax.random.PRNGKey(0)
for (m, k, B) in [(60, 16, 256), (12, 256, 256), (60, 16, 256)]:
    pad = (-N) % BLOCK_N
    codes = jax.random.randint(key, (m, N + pad), 0, k,
                               jnp.int32).astype(jnp.uint8)
    luts = jax.random.uniform(key, (B, m, k), jnp.float32)
    jax.block_until_ready((codes, luts))
    t, ts = timeit(lambda l, c: pk.adc_scan_pallas(l, c, block_n=BLOCK_N),
                   luts, codes)
    print(f"scan m{m}k{k}B{B}: {t*1e3:.1f} ms  {ts}", flush=True)
    t, ts = timeit(lambda l, c: pk.adc_top_k_pallas(
        l, c, 10, valid_n=N, block_n=BLOCK_N, approx=False), luts, codes)
    print(f"topk10 m{m}k{k}B{B}: {t*1e3:.1f} ms ({t/B*1e3:.3f} ms/q) {ts}",
          flush=True)
    del codes, luts
