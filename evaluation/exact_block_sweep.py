"""Fused exact-scan tile-size sweep (the headline kernel's DMA pipeline).

The production brute-force path (`ops/pallas_kernels.fused_exact_scan_pallas`)
streams pre-tiled (d_pad, block_n) bf16 table blocks through VMEM. At the
current default block_n=8192 and d=300 (padded 384 lanes), one block is
~6.3 MB — Pallas double-buffers input blocks, so the pipeline wants
~12.6 MB of VMEM for the table stream alone, brushing the ~16 MB ceiling
next to the resident query batch and accumulators. If Mosaic serializes
the DMA there, the scan runs far under the HBM stream ceiling; smaller
blocks would overlap better. This sweeps block_n at 3M×300, batch 1024
(the headline configuration) and reports effective HBM bandwidth.

Writes reports/exact_block_sweep.json.
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
    log, log_mem, timeit_piped)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3_072_000)
    ap.add_argument("--d", type=int, default=300)
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--blocks", default="2048,4096,8192,16384")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "reports",
        "exact_block_sweep.json"))
    args = ap.parse_args()

    from postgres_word2vec_tpu.utils.config import apply_platform_from_env
    apply_platform_from_env()
    from postgres_word2vec_tpu.evaluation import synth
    from postgres_word2vec_tpu.ops import pallas_kernels as pk

    N, D, B = args.n, args.d, args.b
    vf = synth.generate_wordlike(jax.random.PRNGKey(0), N, D)
    table = vf.astype(jnp.bfloat16)
    q = table[:B].astype(jnp.float32)
    del vf
    jax.block_until_ready(table)
    log_mem("table")

    results = dict(n=N, d=D, b=B)
    table_bytes = N * D * 2
    ref_ids = None
    for bn in [int(x) for x in args.blocks.split(",")]:
        t0 = time.perf_counter()
        tiled, norms, valid = pk.tile_table(table, block_n=bn)
        jax.block_until_ready(tiled)
        log(f"bn={bn}: tiled in {time.perf_counter() - t0:.1f}s "
            f"({tiled.shape})")
        try:
            dists, ids = pk.fused_exact_top_k(q, tiled, norms, 10,
                                              valid_n=valid)
            np.asarray(ids[..., :1])
        except Exception as e:
            # a block size can exceed the scoped-VMEM budget at large B
            # (e.g. bn=16384 at B=1024: (B, bins) minima tile > 16 MB);
            # record the no-go instead of killing the sweep.
            log(f"bn={bn}: FAILED ({type(e).__name__}); skipping")
            results[f"bn{bn}"] = dict(failed=True, error=str(e)[:300])
            del tiled, norms
            continue
        t = timeit_piped(
            lambda qq, tiled=tiled, norms=norms, valid=valid:
            pk.fused_exact_top_k(qq, tiled, norms, 10, valid_n=valid), q)
        ids_h = np.asarray(ids)
        if ref_ids is None:
            ref_ids = ids_h
        overlap = float(np.mean([
            len(set(a) & set(b)) / 10 for a, b in zip(ids_h, ref_ids)]))
        gbps = table_bytes / t / 1e9
        results[f"bn{bn}"] = dict(
            scan_s=t, per_query_ms=t / B * 1e3, eff_gbps=gbps,
            overlap_vs_first=overlap)
        log(f"bn={bn}: {t * 1e3:.1f} ms/scan, {t / B * 1e6:.1f} µs/query, "
            f"{gbps:.0f} GB/s effective, overlap={overlap:.3f}")
        del tiled, norms, dists, ids

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    best = min((v["scan_s"], k) for k, v in results.items()
               if isinstance(v, dict) and "scan_s" in v)[1]
    print(json.dumps({"best": best,
                      "per_query_ms": results[best]["per_query_ms"]}))


if __name__ == "__main__":
    main()
