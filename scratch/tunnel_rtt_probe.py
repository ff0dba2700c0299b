#!/usr/bin/env python3
"""Quantify per-dispatch / per-fetch costs on the tunneled TPU.

The serving path pays N jitted dispatches + M host fetches per coalesced
batch; this measures each primitive so the serve-path design (how many
dispatches/fetches per batch) is driven by data, not folklore.
"""
import time
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from postgres_word2vec_tpu.utils.config import apply_platform_from_env
apply_platform_from_env()

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)

f = jax.jit(lambda a, b: jnp.maximum(a @ b, 0.0))
g2 = jax.jit(lambda a, b: ((a @ b).sum(axis=1),
                           jnp.argmax(a @ b, axis=1).astype(jnp.int32)))
A = jnp.ones((64, 300), jnp.float32)
B = jnp.ones((300, 128), jnp.float32)
A_np = np.ones((64, 300), np.float32)

# warm
r = f(A, B); np.asarray(r[:1, :1])
d, i = g2(A, B); np.asarray(d[:1]); np.asarray(i[:1])


def timeit(label, fn, reps=30):
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:45s} {dt:8.2f} ms", flush=True)
    return dt


# 1. dispatch only (drop result, no materialize) — enqueue cost
timeit("dispatch only (device args)", lambda: f(A, B))
# 2. dispatch + materialize 1 elem
timeit("dispatch + fetch[0,0]", lambda: np.asarray(f(A, B)[:1, :1]))
# 3. dispatch with HOST numpy arg (68 KB transfer inside the call)
timeit("dispatch only (np host arg)", lambda: f(A_np, B))
timeit("dispatch + fetch (np host arg)", lambda: np.asarray(f(A_np, B)[:1, :1]))
# 4. two fetches vs one device_get of the pair
def two_fetch():
    d, i = g2(A, B)
    np.asarray(d); np.asarray(i)
def one_get():
    d, i = g2(A, B)
    jax.device_get((d, i))
timeit("pair: 2x np.asarray", two_fetch)
timeit("pair: jax.device_get((d,i))", one_get)
# 5. chained dependent dispatches then fetch
def chain3():
    x = f(A, B)
    y = f(x[:, :300] if x.shape[1] >= 300 else A, B)
    z = f(y[:, :300] if y.shape[1] >= 300 else A, B)
    np.asarray(z[:1, :1])
timeit("3 chained dispatches + fetch", chain3)

# 6. pull bandwidth: 120 MB device->host
big = jnp.ones((100, 300_000), jnp.float32)
np.asarray(big[:1, :1])
t0 = time.perf_counter()
h = np.asarray(big)
dt = time.perf_counter() - t0
print(f"pull 120 MB: {dt*1e3:.1f} ms ({big.nbytes/dt/1e9:.2f} GB/s)",
      flush=True)
# 7. push bandwidth: 120 MB host->device
hb = np.ones((100, 300_000), np.float32)
t0 = time.perf_counter()
dv = jnp.asarray(hb)
dv.block_until_ready()
dt = time.perf_counter() - t0
print(f"push 120 MB: {dt*1e3:.1f} ms ({hb.nbytes/dt/1e9:.2f} GB/s)",
      flush=True)
