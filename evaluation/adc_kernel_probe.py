#!/usr/bin/env python3
"""A/B probe for the exhaustive ADC scan kernels at 3M rows (VERDICT r2
item 4: attack the dense kernel's (B, N) HBM round-trip).

Times, on random codes/LUTs (timing does not depend on values):
  - dense kernel + approx_min_k     (round-2 default)
  - binned kernel (packed argmin)   (this round's candidate)
at B ∈ {64, 256} for the 12×256 and 60×16 regimes, plus top-k wrappers.

    python evaluation/adc_kernel_probe.py           # 3M
    BENCH_SMALL=1 python evaluation/adc_kernel_probe.py

One JSON line on stdout; progress on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # materialize
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from postgres_word2vec_tpu.ops import pallas_kernels as pk

    small = bool(int(os.environ.get("BENCH_SMALL", "0")))
    N = 307_200 if small else 3_072_000
    K = 10
    rng = np.random.default_rng(0)
    out = {}
    for m, k in ((12, 256), (60, 16)):
        codes_t = jnp.asarray(
            rng.integers(0, k, size=(m, N)).astype(np.uint8))
        for B in (64, 256):
            luts = jnp.asarray(
                np.abs(rng.normal(size=(B, m, k))).astype(np.float32))
            t_dense = timeit(
                lambda: pk.adc_top_k_pallas(luts, codes_t, K, valid_n=N))
            t_binned = timeit(
                lambda: pk.adc_top_k_binned_pallas(luts, codes_t, K,
                                                   valid_n=N))
            key = f"m{m}k{k}_B{B}"
            out[key] = {"dense_ms_per_q": round(t_dense / B * 1e3, 4),
                        "binned_ms_per_q": round(t_binned / B * 1e3, 4),
                        "speedup": round(t_dense / t_binned, 2)}
            log(f"{key}: dense {t_dense*1e3:.1f}ms  binned "
                f"{t_binned*1e3:.1f}ms  ({t_dense/t_binned:.2f}x)")

    if "--sweep" in sys.argv:
        # block-shape sweep for the binned kernel at the throughput batch
        # (VERDICT item 4: close the remaining gap to ~0.2 ms/q at B=256).
        m, k, B = 12, 256, 256
        codes_t = jnp.asarray(
            rng.integers(0, k, size=(m, N)).astype(np.uint8))
        luts = jnp.asarray(
            np.abs(rng.normal(size=(B, m, k))).astype(np.float32))
        sweep = {}
        for bn in (2048, 4096, 8192):
            if N % bn:
                continue
            for bb in (64, 128, 256):
                for bins in (128, 256):
                    if bins > bn // 2:
                        continue
                    try:
                        t = timeit(lambda: pk.adc_scan_binned_pallas(
                            luts, codes_t, block_n=bn, block_b=bb,
                            bins=bins))
                    except Exception as e:  # noqa: BLE001
                        log(f"bn{bn}_bb{bb}_bins{bins}: FAIL {e!r}")
                        continue
                    kk = f"bn{bn}_bb{bb}_bins{bins}"
                    sweep[kk] = round(t / B * 1e3, 4)
                    log(f"{kk}: {t*1e3:.1f}ms ({t/B*1e3:.4f} ms/q)")
        out["sweep_m12k256_B256"] = sweep
    print(json.dumps(out))


if __name__ == "__main__":
    from postgres_word2vec_tpu.utils.config import apply_platform_from_env
    apply_platform_from_env()
    main()
