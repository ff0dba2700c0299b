#!/usr/bin/env python3
"""On-chip probe: exact lax.top_k vs lax.approx_min_k at the PV-shortlist
shape (B queries x 3M rows, k=200) and the plain-scan shape (k=10).

Motivation: R4_REGRESSION_NOTE.md measured scan+top-200 at ~541 ms for
B=256 x 3M while the scan alone is ~58 ms — the exact wide-row top-k is
~89% of the PV shortlist cost. approx_min_k's bin-reduction is O(N) with
cost nearly independent of k; if its shortlist keeps the true top-k, the
exact re-rank makes the final result identical.

Also probes the documented hazard (CLAUDE.md): approx_min_k recall
collapses when true neighbors are regularly strided — we plant true
minima at stride N/k positions and at random positions and compare.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(
                      os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache"))

N = 3_072_000
OUT = {}


def mat(x):
    # materialize a tiny slice to host: the honest completion barrier on
    # the tunneled chip (CLAUDE.md)
    return np.asarray(x.ravel()[:4])


def bench(fn, *args, reps=5):
    f = jax.jit(fn)
    mat(f(*args))          # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        mat(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def main():
    key = jax.random.PRNGKey(0)
    for B in (64, 256):
        d = jax.random.uniform(key, (B, N), jnp.float32)
        row = {}
        row["exact_k10"] = bench(lambda x: lax.top_k(-x, 10)[0], d)
        row["exact_k200"] = bench(lambda x: lax.top_k(-x, 200)[0], d)
        for rt in (0.90, 0.95, 0.99):
            row[f"approx_k200_rt{rt}"] = bench(
                lambda x, rt=rt: lax.approx_min_k(x, 200, recall_target=rt)[0], d)
            row[f"approx_k10_rt{rt}"] = bench(
                lambda x, rt=rt: lax.approx_min_k(x, 10, recall_target=rt)[0], d)
        OUT[f"B{B}"] = row
        print(f"B={B}", json.dumps(row), flush=True)
        del d

    # ---- shortlist fidelity under planted minima (strided vs random) ----
    B = 64
    k_true = 10
    fid = {}
    for placement in ("random", "strided"):
        dn = np.random.default_rng(1).uniform(1.0, 2.0, (B, N)).astype(np.float32)
        gt = np.zeros((B, k_true), np.int64)
        for b in range(B):
            if placement == "random":
                pos = np.random.default_rng(100 + b).choice(N, k_true, False)
            else:
                pos = (np.arange(k_true) * (N // k_true) + b) % N
            dn[b, pos] = np.linspace(0.0, 0.5, k_true)
            gt[b] = pos
        dd = jnp.asarray(dn)
        for rt in (0.90, 0.95, 0.99):
            _, idx = jax.jit(lambda x, rt=rt: lax.approx_min_k(
                x, 200, recall_target=rt))(dd)
            idx = np.asarray(idx)
            hit = np.mean([len(set(gt[b]) & set(idx[b])) / k_true
                           for b in range(B)])
            fid[f"{placement}_rt{rt}_top{k_true}_in_200"] = float(hit)
        del dd
    OUT["fidelity"] = fid
    print(json.dumps(fid), flush=True)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "approx_topk_probe.json"), "w") as f:
        json.dump(OUT, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
