#!/usr/bin/env python3
"""Does the tunnel overlap concurrent RPCs?

(a) N threads each looping device_get on independent arrays — if the
transport serializes, aggregate rate stays ~1/RTT regardless of N.
(b) dispatch latency while fetches are pending — does an enqueue RPC
queue behind an in-flight fetch?
"""
import time
import threading
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from postgres_word2vec_tpu.utils.config import apply_platform_from_env
apply_platform_from_env()

import jax
import jax.numpy as jnp
import numpy as np

f = jax.jit(lambda a, b: jnp.maximum(a @ b, 0.0))
A = jnp.ones((64, 300), jnp.float32)
B = jnp.ones((300, 128), jnp.float32)
r = f(A, B); np.asarray(r[:1, :1])

REPS = 20


def fetch_loop(tid, out):
    t0 = time.perf_counter()
    for _ in range(REPS):
        jax.device_get(f(A, B))
    out[tid] = (time.perf_counter() - t0) / REPS * 1e3


for nthreads in (1, 2, 4):
    out = {}
    ths = [threading.Thread(target=fetch_loop, args=(i, out))
           for i in range(nthreads)]
    t0 = time.perf_counter()
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    wall = time.perf_counter() - t0
    agg = nthreads * REPS / wall
    print(f"{nthreads} threads: per-fetch {np.mean(list(out.values())):6.1f} ms"
          f"  aggregate {agg:6.1f} fetch/s", flush=True)

# (b) dispatch while a big fetch is in flight
big = jnp.ones((2000, 300_000), jnp.float32)   # 2.4 GB -> ~4 min at 10MB/s? no - use 50 MB
big = jnp.ones((50, 300_000), jnp.float32)     # 60 MB ≈ 6 s pull
np.asarray(big[:1, :1])
done = {}


def big_fetch():
    t0 = time.perf_counter()
    jax.device_get(big)
    done["t"] = time.perf_counter() - t0


th = threading.Thread(target=big_fetch)
th.start()
time.sleep(0.5)   # fetch surely in flight
lat = []
for _ in range(10):
    t0 = time.perf_counter()
    f(A, B)   # dispatch only
    lat.append(time.perf_counter() - t0)
print(f"dispatch-under-fetch: {np.median(lat)*1e3:.2f} ms "
      f"(quiet baseline ~0.2 ms)", flush=True)
t0 = time.perf_counter()
jax.device_get(f(A, B))
print(f"small fetch while 60MB fetch in flight: "
      f"{(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
th.join()
print(f"60 MB fetch took {done['t']:.1f} s", flush=True)
