#!/usr/bin/env python3
"""Synthetic-data calibration sweep (VERDICT r2 item 3).

Round 2 calibrated the v2 generator on the PQ *scan* point (ref-equivalent
quantizer: pq@5 0.399 vs FREDDY's published 0.38 at 3M) but not the PV
point (pq_pv@5 0.801 vs published 0.87) — so the production build's 0.80 at
pvf=20 is the data geometry's ceiling, not a quantizer gap
(reports/recall_ceiling_v2_3M.json: the best-of-10 converged-Lloyd control
scores the same 0.80).

This sweep searches generator parameters for a v3 whose ref-equivalent
ceiling hits BOTH points. The lever: the gap between a row's true sibling
variants (sigma_v) and the same-topic distractor shell (sigma_c) controls
whether true neighbors stay inside the ADC top-k·pvf shortlist (→ PV
recall), while sibling count (group) keeps within-shortlist confusion high
(→ scan recall stays low).

    python evaluation/synth_calibrate.py --n 307200 [--configs ...]
    python evaluation/synth_calibrate.py --n 3072000 --configs v2,cand3

Prints one JSON list; progress on stderr.
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

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

#: candidate generator parameter sets. "v2" is the shipped calibration
#: (the baseline); the candidates push the sibling/distractor gap.
CONFIGS = {
    "v2": dict(group=8, beta=0.55, sigma_c=0.7, sigma_v=0.55, fringe_frac=0.0),
    # closer siblings (easier PV), more of them (scan confusion persists)
    "cand1": dict(group=12, beta=0.55, sigma_c=0.7, sigma_v=0.48, fringe_frac=0.0),
    "cand2": dict(group=12, beta=0.55, sigma_c=0.8, sigma_v=0.45, fringe_frac=0.0),
    # wider distractor shell, same siblings
    "cand3": dict(group=8, beta=0.55, sigma_c=0.85, sigma_v=0.5, fringe_frac=0.0),
    # flatter spectrum (harder quantization) + close siblings
    "cand4": dict(group=10, beta=0.5, sigma_c=0.75, sigma_v=0.45, fringe_frac=0.0),
    # strong gap
    "cand5": dict(group=10, beta=0.55, sigma_c=0.9, sigma_v=0.42, fringe_frac=0.0),
    # 3M round-1 sweep: v2 (0.399/0.801) hits scan, cand1 (0.498/0.911)
    # overshoots scan — interpolate the sigma_v/group gap between them.
    "cand6": dict(group=8, beta=0.55, sigma_c=0.7, sigma_v=0.50, fringe_frac=0.0),
    "cand7": dict(group=12, beta=0.55, sigma_c=0.7, sigma_v=0.52, fringe_frac=0.0),
    "cand8": dict(group=10, beta=0.55, sigma_c=0.7, sigma_v=0.50, fringe_frac=0.0),
    "cand9": dict(group=8, beta=0.55, sigma_c=0.7, sigma_v=0.48, fringe_frac=0.0),
    "cand10": dict(group=10, beta=0.55, sigma_c=0.7, sigma_v=0.52, fringe_frac=0.0),
    # 3M round-2 sweep: the sigma_v/group frontier passes through
    # (0.48, 0.88) — the published (0.38, 0.87) point needs DECOUPLING:
    # a fringe tier of same-concept distractors that contests the ADC
    # top-5 without entering the true-sibling band (synth.generate_wordlike
    # fringe_frac/sigma_f).
    "f1": dict(group=32, beta=0.55, sigma_c=0.7, sigma_v=0.5,
               fringe_frac=0.75, sigma_f=0.8),
    "f2": dict(group=48, beta=0.55, sigma_c=0.7, sigma_v=0.5,
               fringe_frac=0.833, sigma_f=0.85),
    "f3": dict(group=32, beta=0.55, sigma_c=0.7, sigma_v=0.55,
               fringe_frac=0.75, sigma_f=0.85),
    "f4": dict(group=24, beta=0.55, sigma_c=0.7, sigma_v=0.5,
               fringe_frac=0.667, sigma_f=0.75),
    "f5": dict(group=32, beta=0.55, sigma_c=0.75, sigma_v=0.45,
               fringe_frac=0.75, sigma_f=0.75),
    # fringe round 2: f5 (0.460/0.887) is the best frontier point —
    # tighten the fringe-to-sibling gap and raise fringe density.
    "f6": dict(group=64, beta=0.55, sigma_c=0.75, sigma_v=0.45,
               fringe_frac=0.875, sigma_f=0.7),
    "f7": dict(group=64, beta=0.55, sigma_c=0.75, sigma_v=0.45,
               fringe_frac=0.875, sigma_f=0.65),
    "f8": dict(group=32, beta=0.55, sigma_c=0.75, sigma_v=0.45,
               fringe_frac=0.75, sigma_f=0.65),
    "f9": dict(group=48, beta=0.55, sigma_c=0.8, sigma_v=0.45,
               fringe_frac=0.833, sigma_f=0.7),
    "f10": dict(group=64, beta=0.55, sigma_c=0.75, sigma_v=0.42,
                fringe_frac=0.875, sigma_f=0.62),
    # fringe round 3: strong fringe lifts pv to 0.94+ at scan 0.45 —
    # trade pv headroom back for scan via sigma_v.
    "f11": dict(group=64, beta=0.55, sigma_c=0.75, sigma_v=0.5,
                fringe_frac=0.875, sigma_f=0.68),
    "f12": dict(group=64, beta=0.55, sigma_c=0.75, sigma_v=0.52,
                fringe_frac=0.875, sigma_f=0.7),
    "f13": dict(group=64, beta=0.55, sigma_c=0.75, sigma_v=0.48,
                fringe_frac=0.875, sigma_f=0.65),
    "f14": dict(group=96, beta=0.55, sigma_c=0.75, sigma_v=0.5,
                fringe_frac=0.917, sigma_f=0.65),
    "f15": dict(group=64, beta=0.55, sigma_c=0.7, sigma_v=0.5,
                fringe_frac=0.875, sigma_f=0.65),
    # fringe round 4: sigma_v no longer moves scan (floor ~0.43 at
    # pv>0.9) — instead shrink the CORE sibling count so GT@5 contains
    # fringe rows (ADC ranks them by noise; PV re-ranks them exactly).
    "f16": dict(group=64, beta=0.55, sigma_c=0.75, sigma_v=0.45,
                fringe_frac=0.9375, sigma_f=0.65),
    "f17": dict(group=64, beta=0.55, sigma_c=0.75, sigma_v=0.45,
                fringe_frac=0.953, sigma_f=0.65),
    "f18": dict(group=32, beta=0.55, sigma_c=0.75, sigma_v=0.45,
                fringe_frac=0.875, sigma_f=0.65),
    "f19": dict(group=64, beta=0.55, sigma_c=0.75, sigma_v=0.5,
                fringe_frac=0.9375, sigma_f=0.68),
    "f20": dict(group=64, beta=0.55, sigma_c=0.75, sigma_v=0.45,
                fringe_frac=0.969, sigma_f=0.65),
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def recall(ids, gt_ids):
    ids, gt_ids = np.asarray(ids), np.asarray(gt_ids)
    hits = sum(len(set(a.tolist()) & set(e.tolist()))
               for a, e in zip(ids, gt_ids))
    return hits / gt_ids.size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=307_200)
    ap.add_argument("--d", type=int, default=300)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--pvf", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--configs", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from postgres_word2vec_tpu.evaluation import synth
    from postgres_word2vec_tpu.models.exact import exact_top_k
    from postgres_word2vec_tpu.models.pq import PQIndex

    names = (args.configs.split(",") if args.configs
             else list(CONFIGS))
    out = []
    for name in names:
        p = CONFIGS[name]
        t0 = time.perf_counter()
        V = synth.generate_wordlike(jax.random.PRNGKey(args.seed), args.n,
                                    args.d, **p)
        np.asarray(V[0, 0])
        queries = V[:args.queries]
        _, gt5 = exact_top_k(queries, V, 5, chunk_size=524288)
        gt5 = np.asarray(gt5)
        # reference-equivalent quantizer: scipy kmeans(iter=10) = 10
        # restarts of converged Lloyd (quantizer_creation.py:13-33).
        pq = PQIndex.build(jax.random.PRNGKey(args.seed + 1), V, m=12,
                           k=256, train_size=100_000, restarts=10,
                           iters=30, init="sample")
        _, ids = pq.search(queries, 5)
        r_scan = recall(ids, gt5)
        _, ids = pq.search_pv(queries, 5, args.pvf, V)
        r_pv = recall(ids, gt5)
        rec = {"config": name, **p, "n": args.n,
               "pq@5": round(r_scan, 4), "pq_pv@5": round(r_pv, 4),
               "targets": {"pq@5": 0.38, "pq_pv@5": 0.87},
               "secs": round(time.perf_counter() - t0, 1)}
        out.append(rec)
        log(f"[{name}] pq@5={r_scan:.3f} pv@5={r_pv:.3f} "
            f"({rec['secs']}s) {p}")
        del pq, V
    print(json.dumps(out))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
