#!/usr/bin/env python3
"""Recall-ceiling control experiment (round-2 VERDICT item 1).

Measures what recall a *reference-equivalent* quantizer achieves on the
bench's synthetic data, independent of this repo's production build. The
reference trains codebooks with scipy ``kmeans(train, k, iter=10)`` —
i.e. 10 RESTARTS of Lloyd run to convergence, best distortion wins
(quantizer_creation.py:13-33) — and encodes with exact 1-NN (faiss,
pq_index.py:31-63). The "reference" quality profile below reproduces those
semantics on TPU (restarts=10, 30 Lloyd iterations ≈ converged, random-row
init); the search stage (full ADC scan / IVFADC w=3 probe / exact re-rank) is
identical math in every implementation, so the resulting recall is the
*data geometry's* ceiling for FREDDY's method class at these parameters.

Usage:
  python evaluation/recall_ceiling.py --gen v2 --n 307200 \
      --quality reference --out reports/recall_ceiling_v2.json

Interpretation: if the ceiling on a generator is far below FREDDY's
published operating points (PQ 0.38 / PQ+PV 0.87 / IVFADC 0.35 /
IVFADC+PV 0.65 at 3M, README.md:118-123), that generator's geometry is
unrepresentative of GoogleNews and recall measured on it says nothing about
index quality. The v2 generator is calibrated so this control lands near
the reference numbers.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from postgres_word2vec_tpu.utils.config import apply_platform_from_env

apply_platform_from_env()

QUALITY = {
    # scipy kmeans(iter=10): 10 restarts, converged Lloyd, random-row init.
    "reference": dict(restarts=10, iters=30, init="sample"),
    # this repo's round-1 build (single 10-iteration Lloyd run).
    "r1": dict(restarts=1, iters=10, init="sample"),
    # round-2 production default: kmeans++ + longer single run.
    "ours": dict(restarts=1, iters=25, init="kmeans++"),
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def recall(ids, gt_ids):
    ids = np.asarray(ids)
    gt_ids = np.asarray(gt_ids)
    hits = sum(len(set(a.tolist()) & set(e.tolist()))
               for a, e in zip(ids, gt_ids))
    return hits / gt_ids.size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", choices=("v1", "v2", "v3"), default="v3")
    ap.add_argument("--n", type=int, default=307_200)
    ap.add_argument("--d", type=int, default=300)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--quality", choices=sorted(QUALITY), default="reference")
    ap.add_argument("--pq-m", type=int, default=12)
    ap.add_argument("--pq-k", type=int, default=256)
    ap.add_argument("--k-coarse", type=int, default=1000)
    ap.add_argument("--train-size", type=int, default=100_000)
    ap.add_argument("--pvf", type=int, default=20)
    ap.add_argument("--w", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from postgres_word2vec_tpu.evaluation import synth
    from postgres_word2vec_tpu.models.exact import exact_top_k
    from postgres_word2vec_tpu.models.ivfadc import IVFADCIndex
    from postgres_word2vec_tpu.models.pq import PQIndex

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    q = QUALITY[args.quality]
    log(f"recall_ceiling: gen={args.gen} n={args.n} quality={args.quality} "
        f"{q} devices={jax.devices()}")

    t0 = time.perf_counter()
    if args.gen == "v1":
        V = synth.generate_mixture(jax.random.PRNGKey(args.seed), args.n,
                                   args.d)
    else:
        params = synth.V2_PARAMS if args.gen == "v2" else synth.V3_PARAMS
        V = synth.generate_wordlike(jax.random.PRNGKey(args.seed), args.n,
                                    args.d, **params)
    np.asarray(V[0, 0])
    log(f"data in {time.perf_counter() - t0:.1f}s")

    queries = V[:args.queries]
    t0 = time.perf_counter()
    gt = {}
    for kk in (5, 10):
        _, ids = exact_top_k(queries, V, kk, chunk_size=524288)
        gt[kk] = np.asarray(ids)
    log(f"ground truth in {time.perf_counter() - t0:.1f}s")

    results = {"gen": args.gen, "n": args.n, "d": args.d,
               "quality": args.quality, "quality_params": q,
               "pq_m": args.pq_m, "pq_k": args.pq_k,
               "k_coarse": args.k_coarse, "pvf": args.pvf, "w": args.w,
               "reference_targets": {
                   "pq@5": 0.38, "pq_pv@5": 0.87,
                   "ivfadc@5": 0.35, "ivfadc_pv@5": 0.65,
                   "source": "/root/reference/README.md:118-123 (3M)"}}

    # ---------------------------------------------------------------- PQ
    t0 = time.perf_counter()
    pq = PQIndex.build(jax.random.PRNGKey(args.seed + 1), V, m=args.pq_m,
                       k=args.pq_k, train_size=args.train_size, **q)
    log(f"PQ built in {time.perf_counter() - t0:.1f}s")
    for kk in (5, 10):
        _, ids = pq.search(queries, kk)
        results[f"pq@{kk}"] = recall(ids, gt[kk])
        _, ids = pq.search_pv(queries, kk, args.pvf, V)
        results[f"pq_pv@{kk}"] = recall(ids, gt[kk])
    log(f"PQ: @5={results['pq@5']:.3f} pv@5={results['pq_pv@5']:.3f} "
        f"@10={results['pq@10']:.3f} pv@10={results['pq_pv@10']:.3f}")
    del pq

    # ------------------------------------------------------------ IVFADC
    t0 = time.perf_counter()
    ivf = IVFADCIndex.build(jax.random.PRNGKey(args.seed + 2), V,
                            m=args.pq_m, k=args.pq_k,
                            k_coarse=args.k_coarse,
                            train_size=args.train_size, **q)
    log(f"IVFADC built in {time.perf_counter() - t0:.1f}s "
        f"(list_cap={ivf.list_cap})")
    for kk in (5, 10):
        _, ids = ivf.search(queries, kk, w=args.w)
        results[f"ivfadc@{kk}"] = recall(ids, gt[kk])
        _, ids = ivf.search_pv(queries, kk, args.pvf, V, w=args.w)
        results[f"ivfadc_pv@{kk}"] = recall(ids, gt[kk])
    log(f"IVFADC: @5={results['ivfadc@5']:.3f} "
        f"pv@5={results['ivfadc_pv@5']:.3f} @10={results['ivfadc@10']:.3f} "
        f"pv@10={results['ivfadc_pv@10']:.3f}")

    print(json.dumps(results))
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(results, indent=1))
        log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
