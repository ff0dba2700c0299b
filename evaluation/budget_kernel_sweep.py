"""Budget-kernel microbench: per-query vs tile-grouped (rows sweep).

Measures the selectivity-proportional probe primitive on realistic IVPQ
join shapes (the flagship batch path, SURVEY §3.3): B queries × P tile
slots over a few hundred cell-aligned tiles, fine codebook m=30/k=32 —
the shapes `models/ivpq._ivpq_round_budget` feeds the kernels at 5k×100k.

The per-query kernel runs one query row per program (one-hot rebuilt per
probe, 1/8 sublane fill); the grouped kernel shares a tile's one-hot and
matmul across `rows` queries (program bound ⌈B·P/rows⌉ + n_tiles). This
sweep picks the production `rows` default and validates the dispatch
bound on the real chip.

Writes reports/budget_kernel_sweep.json.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from postgres_word2vec_tpu.evaluation.benchutil import (  # noqa: E402
    log, timeit_piped)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1024, help="query batch")
    ap.add_argument("--p", type=int, default=16, help="tile slots/query")
    ap.add_argument("--block-t", type=int, default=256)
    ap.add_argument("--n-tiles", type=int, default=400,
                    help="real tiles (≈100k targets at block_t=256)")
    ap.add_argument("--m", type=int, default=30)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--zipf", type=float, default=1.1,
                    help="tile popularity skew (cell sizes are zipfy)")
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode kernels (CPU smoke run)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "reports",
        "budget_kernel_sweep.json"))
    args = ap.parse_args()

    from postgres_word2vec_tpu.utils.config import apply_platform_from_env
    apply_platform_from_env()
    from postgres_word2vec_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(0)
    B, P, bt, nt, m, k = (args.b, args.p, args.block_t, args.n_tiles,
                          args.m, args.k)
    na = (nt + 1) * bt
    codes = rng.integers(0, k, size=(m, na)).astype(np.uint8)
    rowterm = rng.normal(size=(na,)).astype(np.float32) ** 2
    rowterm[nt * bt:] = np.inf
    luts = np.abs(rng.normal(size=(B, m, k))).astype(np.float32)
    # zipf-weighted tile choice mimics size-ordered cell selection.
    w = (1.0 / np.arange(1, nt + 1) ** args.zipf)
    tiles = rng.choice(nt, size=(B, P), p=w / w.sum()).astype(np.int32)

    luts_d = jnp.asarray(luts)
    codes_d = jnp.asarray(codes)
    rt_d = jnp.asarray(rowterm)
    tiles_d = jnp.asarray(tiles)

    results = dict(b=B, p=P, block_t=bt, n_tiles=nt, m=m, k=k,
                   zipf=args.zipf,
                   mean_run=float(B * P / len(np.unique(tiles))))

    t0 = time.perf_counter()
    ref = pk.budget_adc_pallas(luts_d, codes_d, rt_d, tiles_d, block_t=bt,
                               interpret=args.interpret)
    np.asarray(ref[..., :1])
    log(f"per-query compile+run {time.perf_counter() - t0:.1f}s")
    t = timeit_piped(
        lambda q: pk.budget_adc_pallas(q, codes_d, rt_d, tiles_d,
                                       block_t=bt,
                                       interpret=args.interpret), luts_d)
    results["per_query_s"] = t
    results["per_query_programs"] = B * P
    log(f"per-query: {t * 1e3:.2f} ms ({B * P} programs)")
    ref = np.asarray(ref)
    fin = np.isfinite(ref)

    for rows in (8, 16, 32, 64):
        t0 = time.perf_counter()
        out = pk.budget_adc_grouped_pallas(luts_d, codes_d, rt_d, tiles_d,
                                           block_t=bt, rows=rows,
                                           interpret=args.interpret)
        np.asarray(out[..., :1])
        log(f"rows={rows} compile+run {time.perf_counter() - t0:.1f}s")
        got = np.asarray(out)
        ok = (np.array_equal(np.isfinite(got), fin)
              and np.allclose(got[fin], ref[fin], rtol=1e-5, atol=1e-5))
        t = timeit_piped(
            lambda q, rows=rows: pk.budget_adc_grouped_pallas(
                q, codes_d, rt_d, tiles_d, block_t=bt, rows=rows,
                interpret=args.interpret), luts_d)
        progs = -(-B * P // rows) + nt + 1
        results[f"grouped_r{rows}_s"] = t
        results[f"grouped_r{rows}_programs"] = progs
        results[f"grouped_r{rows}_match"] = bool(ok)
        log(f"grouped rows={rows}: {t * 1e3:.2f} ms ({progs} programs, "
            f"match={ok}, {results['per_query_s'] / t:.2f}x)")

    # int8 gathered LUTs at the best-of-sweep row count candidates
    for rows in (16, 32):
        t0 = time.perf_counter()
        out = pk.budget_adc_grouped_pallas(luts_d, codes_d, rt_d, tiles_d,
                                           block_t=bt, rows=rows,
                                           lut_dtype="int8",
                                           interpret=args.interpret)
        np.asarray(out[..., :1])
        log(f"int8 rows={rows} compile+run {time.perf_counter() - t0:.1f}s")
        got = np.asarray(out)
        # int8 quantization (max/254) + the bf16 reference's own LUT
        # rounding (max/512): ref is itself approximate.
        bound = (m * luts.reshape(B, -1).max(axis=1)
                 * (1 / 254 + 1 / 512) * 1.01 + 1e-3)
        err = np.abs(np.where(fin, got - ref, 0.0))
        ok = bool((err <= bound[:, None]).all()
                  and np.array_equal(np.isfinite(got), fin))
        t = timeit_piped(
            lambda q, rows=rows: pk.budget_adc_grouped_pallas(
                q, codes_d, rt_d, tiles_d, block_t=bt, rows=rows,
                lut_dtype="int8", interpret=args.interpret), luts_d)
        results[f"grouped_i8_r{rows}_s"] = t
        results[f"grouped_i8_r{rows}_match"] = ok
        log(f"grouped int8 rows={rows}: {t * 1e3:.2f} ms (match={ok}, "
            f"{results['per_query_s'] / t:.2f}x)")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    # "best" only among configs whose outputs matched the reference
    best = min((v, k2) for k2, v in results.items()
               if k2.endswith("_s")
               and results.get(k2[:-2] + "_match", True))[1]
    print(json.dumps({"best": best,
                      "per_query_ms": results["per_query_s"] * 1e3}))


if __name__ == "__main__":
    main()
