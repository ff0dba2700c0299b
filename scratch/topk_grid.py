"""On-chip top-k policy grid: native lax.top_k vs blockwise reduction
across (row width, k) at f32, B chosen to mirror bench shapes.

Writes scratch/topk_grid.json; informs ops/topk.top_k_smallest's TPU
dispatch (see reports/R4_REGRESSION_NOTE.md for the history).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from postgres_word2vec_tpu.ops import topk


def timeit(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][..., :1])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0][..., :1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


results = {}
for n, B in [(102_400, 512), (409_600, 512), (1_048_576, 256),
             (3_072_000, 256)]:
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, n), jnp.float32)
    x = jax.block_until_ready(x)
    for k in (5, 10, 50, 200, 1000):

        @jax.jit
        def native(d):
            neg, i = lax.top_k(-d, k)
            return -neg, i

        @jax.jit
        def blockwise(d):
            return topk._blockwise_top_k_smallest(d, k)

        tn = timeit(native, x)
        tb = timeit(blockwise, x)
        results[f"n{n}_B{B}_k{k}"] = {"native_ms": tn * 1e3,
                                      "blockwise_ms": tb * 1e3,
                                      "blockwise_wins": tb < tn}
        print(f"n={n} B={B} k={k}: native {tn*1e3:.1f} ms, "
              f"blockwise {tb*1e3:.1f} ms", flush=True)
    del x

with open("/root/repo/scratch/topk_grid.json", "w") as f:
    json.dump(results, f, indent=1)
print("done")
