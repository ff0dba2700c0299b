"""Pallas ADC kernel — validated in interpreter mode on CPU (the compiled
path is exercised on real TPU by bench.py and the verify drive)."""

import jax.numpy as jnp
import numpy as np

from postgres_word2vec_tpu.ops import adc, lut
from postgres_word2vec_tpu.ops import pallas_kernels as pk


def test_adc_scan_pallas_matches_gather_path(rng):
    B, m, k, n = 4, 6, 16, 1024
    cb = jnp.asarray(rng.normal(size=(m, k, 5)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, 30)).astype(np.float32))
    codes = rng.integers(0, k, size=(n, m)).astype(np.uint8)
    luts = lut.build_luts(q, cb)
    want = np.asarray(adc.adc_distances(luts, jnp.asarray(codes)))
    got = np.asarray(pk.adc_scan_pallas(luts, jnp.asarray(codes.T),
                                        block_n=256, interpret=True))
    # kernel uses bf16 LUTs: tolerate relative error ~1e-2
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_adc_distances_auto_cpu_fallback(rng):
    B, m, k, n = 2, 4, 8, 100
    cb = jnp.asarray(rng.normal(size=(m, k, 3)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, 12)).astype(np.float32))
    codes = rng.integers(0, k, size=(n, m)).astype(np.uint8)
    luts = lut.build_luts(q, cb)
    assert not pk.supports_pallas()  # conftest forces CPU
    got = np.asarray(adc.adc_distances_auto(luts, jnp.asarray(codes), False))
    want = np.asarray(adc.adc_distances(luts, jnp.asarray(codes)))
    np.testing.assert_allclose(got, want)
