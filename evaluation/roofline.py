#!/usr/bin/env python3
"""Roofline probe: measure this chip's effective ceilings, then the achieved
throughput of each hot kernel at 3M×300 scale.

    python evaluation/roofline.py [--small]

Prints one JSON document: device ceilings (HBM stream GB/s, bf16/int8 MXU
TFLOPs) and, per kernel, the achieved rate and its roofline fraction given
the kernel's arithmetic intensity. This quantifies the "every hot kernel at
speed-of-light" claim — the exact/ADC scans are HBM-streaming kernels, so
their bound is the measured stream rate, not peak FLOPs.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf if getattr(leaf, "ndim", 0) == 0 else leaf[..., :1])


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure_ceilings() -> dict:
    out = {}
    # HBM stream: best of three read-dominated probes — a reduction can be
    # VPU-bound, so also probe with a B=8 matmul over a large table (reads
    # table once; FLOPs are negligible vs the MXU).
    n = 256 * 1024 * 1024  # 512 MB bf16
    x = jnp.ones((n,), jnp.bfloat16)
    t = timeit(jax.jit(lambda a: jnp.sum(a.astype(jnp.float32))), x)
    rates = [n * 2 / t / 1e9]
    del x
    rows, d = 4 * 1024 * 1024, 256      # 2 GB bf16 table
    tab = jnp.ones((rows, d), jnp.bfloat16)
    q8 = jnp.ones((8, d), jnp.bfloat16)
    t = timeit(jax.jit(lambda q, v: jnp.min(
        jnp.dot(q, v.T, preferred_element_type=jnp.float32), axis=-1)),
        q8, tab)
    rates.append(rows * d * 2 / t / 1e9)
    del tab
    out["hbm_read_gbps"] = max(rates)
    out["hbm_probe_gbps"] = rates

    # bf16 MXU peak: large square matmul (compute >> memory).
    m = 16384
    a = jnp.ones((m, m), jnp.bfloat16)
    g = jax.jit(lambda p, q: jnp.dot(p, q,
                                     preferred_element_type=jnp.float32))
    t = timeit(g, a, a)
    out["mxu_bf16_tflops"] = 2 * m**3 / t / 1e12

    # int8 MXU rate.
    ai = jnp.ones((m, m), jnp.int8)
    h = jax.jit(lambda p, q: jnp.dot(p, q,
                                     preferred_element_type=jnp.int32))
    t = timeit(h, ai, ai)
    out["mxu_int8_tops"] = 2 * m**3 / t / 1e12
    del a, ai
    return out


def measure_kernels(n: int, d: int) -> dict:
    from postgres_word2vec_tpu.evaluation import synth
    from postgres_word2vec_tpu.models.exact import ExactIndex
    from postgres_word2vec_tpu.models.pq import PQIndex

    V = synth.generate_wordlike(jax.random.PRNGKey(0), n, d)
    out = {}

    B = 1024
    ex = ExactIndex(V, "bfloat16")
    t = timeit(lambda q: ex.search(q, 10, approx=True), V[:B])
    out["exact_bf16_scan"] = {
        "wall_s": t, "bytes": n * d * 2,
        "flops": 2 * B * n * d,
        "gbps": n * d * 2 / t / 1e9,
        "tflops": 2 * B * n * d / t / 1e12,
        "note": f"B={B} batched scan; one HBM pass over the bf16 table"}
    del ex

    ex8 = ExactIndex(V, "int8")
    t = timeit(lambda q: ex8.search(q, 10, approx=True), V[:B])
    out["exact_int8_scan"] = {
        "wall_s": t, "bytes": n * d,
        "flops": 2 * B * n * d,
        "gbps": n * d / t / 1e9,
        "tops": 2 * B * n * d / t / 1e12,
        "note": "int8 table + int8 MXU matmul"}
    del ex8

    Bq = 64
    pq = PQIndex.build(jax.random.PRNGKey(1), V, m=12, k=256,
                       train_size=100_000, iters=10)
    ct = pq.transposed_codes()
    t = timeit(lambda q: pq.search(q, 10), V[:Bq])
    m, k = 12, 256
    out["pq_adc_scan"] = {
        "wall_s": t, "bytes": int(ct.shape[1]) * m * 4,
        "flops": 2 * Bq * int(ct.shape[1]) * k * m,
        "gbps": int(ct.shape[1]) * m * 4 / t / 1e9,
        "tflops": 2 * Bq * int(ct.shape[1]) * k * m / t / 1e12,
        "note": f"B={Bq} Pallas matmul-scan; FLOPs count the one-hot "
                f"formulation (k per code read)"}
    return out


def main() -> None:
    small = "--small" in sys.argv
    n, d = (307_200, 300) if small else (3_072_000, 300)
    ceil = measure_ceilings()
    kern = measure_kernels(n, d)
    for v in kern.values():
        if "tops" in v:
            v["roofline"] = "compute" if (
                v["tops"] / ceil["mxu_int8_tops"]
                > v["gbps"] / ceil["hbm_read_gbps"]) else "memory"
            v["pct_of_bound"] = round(100 * max(
                v["tops"] / ceil["mxu_int8_tops"],
                v["gbps"] / ceil["hbm_read_gbps"]), 1)
        else:
            v["roofline"] = "compute" if (
                v["tflops"] / ceil["mxu_bf16_tflops"]
                > v["gbps"] / ceil["hbm_read_gbps"]) else "memory"
            v["pct_of_bound"] = round(100 * max(
                v["tflops"] / ceil["mxu_bf16_tflops"],
                v["gbps"] / ceil["hbm_read_gbps"]), 1)
    print(json.dumps({"n": n, "d": d, "ceilings": ceil,
                      "kernels": kern}, indent=2))


if __name__ == "__main__":
    from postgres_word2vec_tpu.utils.config import apply_platform_from_env
    apply_platform_from_env()
    main()
