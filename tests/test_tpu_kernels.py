"""Compiled Pallas kernels vs XLA reference paths on the REAL chip.

Round-1 gap: the Pallas kernels were only ever exercised in interpret mode
(CPU conftest); the compiled TPU lowerings ran solely inside bench. These
tests run the actual Mosaic-compiled kernels and compare against the XLA
paths, including block-boundary shapes.

Run with:  PW2V_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q
(auto-skipped in the regular CPU suite).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def pk():
    from postgres_word2vec_tpu.ops import pallas_kernels as pk
    assert pk.supports_pallas(), "these tests need the TPU backend"
    return pk


@pytest.mark.parametrize("t", [2048, 4096, 6144])   # block multiples
def test_adc_scan_compiled_matches_xla(pk, rng, t):
    from postgres_word2vec_tpu.ops import adc

    B, m, k = 16, 12, 256
    codes = rng.integers(0, k, size=(t, m)).astype(np.int32)
    luts = rng.normal(size=(B, m, k)).astype(np.float32)
    want = np.asarray(adc.adc_distances(jnp.asarray(luts),
                                        jnp.asarray(codes)))
    got = np.asarray(pk.adc_scan_pallas(jnp.asarray(luts),
                                        jnp.asarray(codes.T),
                                        block_n=2048))
    # bf16 LUT: |err| ≤ m · ulp(bf16) · |lut| ≈ 0.05 at these magnitudes
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=6e-2)


@pytest.mark.parametrize("t_real", [2047, 2048, 2049])  # boundary shapes
def test_adc_distances_auto_boundary(pk, rng, t_real):
    """adc_distances_auto pads ragged row counts to the kernel block and
    slices back — boundary shapes must match the XLA path exactly."""
    from postgres_word2vec_tpu.ops import adc

    B, m, k = 8, 6, 32
    codes = rng.integers(0, k, size=(t_real, m)).astype(np.int32)
    luts = rng.normal(size=(B, m, k)).astype(np.float32)
    want = np.asarray(adc.adc_distances(jnp.asarray(luts),
                                        jnp.asarray(codes)))
    got = np.asarray(adc.adc_distances_auto(jnp.asarray(luts),
                                            jnp.asarray(codes), True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_adc_scan_binned_compiled(pk, rng):
    from postgres_word2vec_tpu.ops import adc

    B, m, k, t = 8, 12, 256, 4096
    codes = rng.integers(0, k, size=(t, m)).astype(np.int32)
    luts = rng.normal(size=(B, m, k)).astype(np.float32) ** 2
    dense = np.asarray(adc.adc_distances(jnp.asarray(luts),
                                         jnp.asarray(codes)))
    mins, ids = pk.adc_scan_binned_pallas(jnp.asarray(luts),
                                          jnp.asarray(codes.T),
                                          block_n=2048, bins=128)
    mins, ids = np.asarray(mins), np.asarray(ids)
    # every reported min is the dense value at its reported id
    np.testing.assert_allclose(np.take_along_axis(dense, ids, axis=-1),
                               mins, rtol=2e-2, atol=2e-2)
    # strided-bin partition: the global min survives in some bin
    np.testing.assert_allclose(mins.min(-1), dense.min(-1), rtol=2e-2,
                               atol=2e-2)


def test_fused_exact_scan_compiled(pk, rng):
    B, d, n = 16, 300, 16384
    v = rng.normal(size=(n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    q = v[:B]
    tiled, norms, valid = pk.tile_table(jnp.asarray(v), block_n=8192)
    d5, i5 = pk.fused_exact_top_k(jnp.asarray(q), tiled, norms, 5,
                                  valid_n=valid)
    dists_true = ((q[:, None, :] - v[None]) ** 2).sum(-1)
    want = np.sort(dists_true, -1)[:, :5]
    # bf16 table: compare distances loosely, top-1 must be the query itself
    assert (np.asarray(i5)[:, 0] == np.arange(B)).all()
    np.testing.assert_allclose(np.asarray(d5), want, atol=5e-2)


def test_budget_adc_compiled_matches_xla(pk, rng):
    from postgres_word2vec_tpu.ops import adc

    B, m, k, block_t = 12, 12, 256, 256
    nt = 7
    na = (nt + 1) * block_t
    codes_rows = rng.integers(0, k, size=(na, m)).astype(np.int32)
    rowterm = rng.normal(size=(na,)).astype(np.float32)
    rowterm[3 * block_t + 77:4 * block_t] = np.inf   # intra-tile padding
    rowterm[nt * block_t:] = np.inf                  # inf tile
    luts = rng.normal(size=(B, m, k)).astype(np.float32)
    tiles = rng.integers(0, nt, size=(B, 5)).astype(np.int32)
    tiles[0, -1] = nt  # unused slot

    want = np.asarray(adc.budget_adc_xla(
        jnp.asarray(luts), jnp.asarray(codes_rows), jnp.asarray(rowterm),
        jnp.asarray(tiles), block_t=block_t))
    got = np.asarray(pk.budget_adc_pallas(
        jnp.asarray(luts), jnp.asarray(codes_rows.T), jnp.asarray(rowterm),
        jnp.asarray(tiles), block_t=block_t))
    fin = np.isfinite(want)
    np.testing.assert_array_equal(np.isfinite(got), fin)
    np.testing.assert_allclose(got[fin], want[fin], rtol=2e-2, atol=2e-2)


def test_budget_exact_compiled_matches_xla(pk, rng):
    from postgres_word2vec_tpu.ops import adc

    B, d, block_t = 10, 300, 256
    nt = 5
    na = (nt + 1) * block_t
    vecs = rng.normal(size=(na, d)).astype(np.float32)
    rownorm = (vecs ** 2).sum(-1).astype(np.float32)
    rownorm[nt * block_t:] = np.inf
    queries = rng.normal(size=(B, d)).astype(np.float32)
    tiles = rng.integers(0, nt, size=(B, 4)).astype(np.int32)

    want = np.asarray(adc.budget_exact_xla(
        jnp.asarray(queries), jnp.asarray(vecs), jnp.asarray(rownorm),
        jnp.asarray(tiles), block_t=block_t))
    got = np.asarray(pk.budget_exact_pallas(
        jnp.asarray(queries), jnp.asarray(vecs.T), jnp.asarray(rownorm),
        jnp.asarray(tiles), block_t=block_t))
    fin = np.isfinite(want)
    np.testing.assert_array_equal(np.isfinite(got), fin)
    # bf16 q·v cross term
    np.testing.assert_allclose(got[fin], want[fin], rtol=3e-2, atol=0.3)


def test_ivfadc_tiled_probe_compiled_end_to_end(pk, rng):
    """Full IVFADC budget probe (cell selection + Pallas kernel + top-k) on
    the chip vs the XLA path."""
    from postgres_word2vec_tpu.models import ivfadc as ivf_mod
    from postgres_word2vec_tpu.models.ivfadc import IVFADCIndex

    v = rng.normal(size=(6000, 24)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    idx = IVFADCIndex.build(jax.random.PRNGKey(1), jnp.asarray(v), m=6,
                            k=16, k_coarse=20, train_size=None, iters=6)
    t = idx.tiled(block_t=256)
    q = jnp.asarray(v[:8])
    p = idx._auto_budget(3, None, full=True)
    d_tpu, i_tpu, f_tpu, _ = ivf_mod._ivfadc_probe_budget(
        q, idx.coarse.centroids, idx.codebook.centroids, t, w_lo=0, w_hi=3,
        k=5, p_budget=p, block_t=t.block_t, use_pallas=True)
    d_xla, i_xla, f_xla, _ = ivf_mod._ivfadc_probe_budget(
        q, idx.coarse.centroids, idx.codebook.centroids, t, w_lo=0, w_hi=3,
        k=5, p_budget=p, block_t=t.block_t, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(f_tpu), np.asarray(f_xla))
    np.testing.assert_allclose(np.asarray(d_tpu), np.asarray(d_xla),
                               rtol=2e-2, atol=2e-2)
    overlap = np.mean([len(set(a.tolist()) & set(b.tolist())) / 5
                       for a, b in zip(np.asarray(i_tpu),
                                       np.asarray(i_xla))])
    assert overlap >= 0.9  # bf16 LUT may flip exact near-ties


def test_narrow_dtype_codes_compiled(pk, rng):
    """Compiled kernels with uint8/int16/int8 code streams match int32
    bit-exactly on the real chip (narrow streaming is the production
    layout; interpret-mode parity is in test_pallas.py)."""
    from postgres_word2vec_tpu.ops import lut

    B, n = 4, 4096
    for m, k, dt in ((6, 256, np.uint8), (12, 1024, np.int16),
                     (10, 16, np.int8)):
        cb = jnp.asarray(rng.normal(size=(m, k, 5)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(B, 5 * m)).astype(np.float32))
        codes32 = rng.integers(0, k, size=(n, m)).astype(np.int32)
        luts = lut.build_luts(q, cb)
        ref = np.asarray(pk.adc_scan_pallas(luts, jnp.asarray(codes32.T)))
        got = np.asarray(pk.adc_scan_pallas(
            luts, jnp.asarray(codes32.T.astype(dt))))
        np.testing.assert_array_equal(got, ref), (m, k, dt)


def test_adc_top_k_binned_compiled(pk, rng):
    """Compiled binned top-k wrapper: k=1 equals the dense argmin; all
    candidate (id, val) pairs are consistent; valid_n masking holds."""
    from postgres_word2vec_tpu.ops import lut

    B, m, k, n = 4, 6, 16, 8192
    cb = jnp.asarray(rng.normal(size=(m, k, 5)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, 30)).astype(np.float32))
    codes = rng.integers(0, k, size=(n, m)).astype(np.uint8)
    luts = lut.build_luts(q, cb)
    ct = jnp.asarray(codes.T)
    dense = np.asarray(pk.adc_scan_pallas(luts, ct))
    valid_n = 8000
    masked = dense.copy()
    masked[:, valid_n:] = np.inf

    v1, i1 = pk.adc_top_k_binned_pallas(luts, ct, 1, valid_n=valid_n,
                                        approx=False)
    np.testing.assert_array_equal(np.asarray(i1)[:, 0],
                                  masked.argmin(axis=-1))
    vals, ids = pk.adc_top_k_binned_pallas(luts, ct, 8, valid_n=valid_n,
                                           approx=False)
    vals, ids = np.asarray(vals), np.asarray(ids)
    fin = np.isfinite(vals)
    bi = np.broadcast_to(np.arange(B)[:, None], ids.shape)
    np.testing.assert_allclose(vals[fin], dense[bi[fin], ids[fin]],
                               rtol=1e-5)
    assert (ids[fin] < valid_n).all()


def test_adc_scan_int8_compiled(pk, rng):
    """Compiled int8-LUT path (Mosaic int8 matmul + int32 accumulate) vs
    the XLA gather reference at the quantization error bound."""
    from postgres_word2vec_tpu.ops import adc

    B, m, k, t = 16, 12, 256, 4096
    codes = rng.integers(0, k, size=(t, m)).astype(np.uint8)
    luts = np.abs(rng.normal(size=(B, m, k))).astype(np.float32)
    want = np.asarray(adc.adc_distances(jnp.asarray(luts),
                                        jnp.asarray(codes.astype(np.int32))))
    got = np.asarray(pk.adc_scan_pallas(jnp.asarray(luts),
                                        jnp.asarray(codes.T),
                                        block_n=2048, lut_dtype="int8"))
    bound = m * luts.reshape(B, -1).max(axis=1) / 254 * 1.01
    assert (np.abs(got - want) <= bound[:, None]).all()


def test_adc_binned_int8_compiled(pk, rng):
    """Compiled int8 binned kernel: per-bin mins must equal the binned
    reduction of the compiled int8 dense output bit-for-bit."""
    B, m, k, t = 16, 12, 256, 4096
    codes = rng.integers(0, k, size=(t, m)).astype(np.uint8)
    luts = np.abs(rng.normal(size=(B, m, k))).astype(np.float32)
    ct = jnp.asarray(codes.T)
    dense = np.asarray(pk.adc_scan_pallas(jnp.asarray(luts), ct,
                                          block_n=2048, lut_dtype="int8"))
    mins, ids = pk.adc_scan_binned_pallas(jnp.asarray(luts), ct,
                                          block_n=2048, bins=128,
                                          lut_dtype="int8")
    mins, ids = np.asarray(mins), np.asarray(ids)
    binned = dense.reshape(B, -1, 16, 128).min(axis=2).reshape(B, -1)
    np.testing.assert_array_equal(mins, binned)
    np.testing.assert_array_equal(
        np.take_along_axis(dense, ids, axis=-1), binned)


def test_budget_adc_grouped_compiled(pk, rng):
    """Compiled tile-grouped budget ADC vs the per-query kernel."""
    B, m, k, block_t, nt, P = 64, 6, 32, 512, 5, 4
    na = (nt + 1) * block_t
    codes = rng.integers(0, k, size=(na, m)).astype(np.uint8)
    rowterm = rng.normal(size=(na,)).astype(np.float32)
    rowterm[nt * block_t:] = np.inf
    luts = np.abs(rng.normal(size=(B, m, k))).astype(np.float32)
    tiles = rng.integers(0, nt, size=(B, P)).astype(np.int32)
    tiles[3, 2] = nt
    ref = np.asarray(pk.budget_adc_pallas(
        jnp.asarray(luts), jnp.asarray(codes.T), jnp.asarray(rowterm),
        jnp.asarray(tiles), block_t=block_t))
    got = np.asarray(pk.budget_adc_grouped_pallas(
        jnp.asarray(luts), jnp.asarray(codes.T), jnp.asarray(rowterm),
        jnp.asarray(tiles), block_t=block_t))
    fin = np.isfinite(ref)
    np.testing.assert_array_equal(np.isfinite(got), fin)
    np.testing.assert_allclose(got[fin], ref[fin], rtol=1e-5, atol=1e-4)


def test_budget_exact_grouped_compiled(pk, rng):
    B, d, block_t, nt, P = 64, 300, 512, 5, 4
    na = (nt + 1) * block_t
    vecs = rng.normal(size=(na, d)).astype(np.float32)
    rownorm = (vecs * vecs).sum(axis=1)
    rownorm[nt * block_t:] = np.inf
    q = rng.normal(size=(B, d)).astype(np.float32)
    tiles = rng.integers(0, nt, size=(B, P)).astype(np.int32)
    ref = np.asarray(pk.budget_exact_pallas(
        jnp.asarray(q), jnp.asarray(vecs.T), jnp.asarray(rownorm),
        jnp.asarray(tiles), block_t=block_t))
    got = np.asarray(pk.budget_exact_grouped_pallas(
        jnp.asarray(q), jnp.asarray(vecs.T), jnp.asarray(rownorm),
        jnp.asarray(tiles), block_t=block_t))
    fin = np.isfinite(ref)
    np.testing.assert_array_equal(np.isfinite(got), fin)
    np.testing.assert_allclose(got[fin], ref[fin], rtol=1e-4, atol=1e-3)


def test_budget_adc_grouped_int8_compiled(pk, rng):
    """Compiled int8 grouped budget kernel ((rows,1) f32 scale block
    beside int8 lutx under scalar prefetch) vs bf16 per-query, within the
    per-query quantization bound."""
    B, m, k, block_t, nt, P = 64, 6, 32, 512, 5, 4
    na = (nt + 1) * block_t
    codes = rng.integers(0, k, size=(na, m)).astype(np.uint8)
    rowterm = (rng.normal(size=(na,)) ** 2).astype(np.float32)
    rowterm[nt * block_t:] = np.inf
    luts = np.abs(rng.normal(size=(B, m, k))).astype(np.float32)
    tiles = rng.integers(0, nt, size=(B, P)).astype(np.int32)
    ref = np.asarray(pk.budget_adc_pallas(
        jnp.asarray(luts), jnp.asarray(codes.T), jnp.asarray(rowterm),
        jnp.asarray(tiles), block_t=block_t))
    for rows in (8, 16):
        got = np.asarray(pk.budget_adc_grouped_pallas(
            jnp.asarray(luts), jnp.asarray(codes.T), jnp.asarray(rowterm),
            jnp.asarray(tiles), block_t=block_t, rows=rows,
            lut_dtype="int8"))
        fin = np.isfinite(ref)
        np.testing.assert_array_equal(np.isfinite(got), fin)
        # int8 quantization (max/254) PLUS the bf16 reference's own LUT
        # rounding (up to max/512 per lookup) — ref is not exact either.
        bound = (m * luts.reshape(B, -1).max(axis=1)
                 * (1 / 254 + 1 / 512) * 1.01 + 1e-2)
        err = np.abs(np.where(fin, got - ref, 0.0))
        assert (err <= bound[:, None]).all(), rows


def test_pv_approx_shortlist_compiled_recall(pk, rng):
    """On-chip PV with the approx partial-reduce shortlist must match the
    exact-shortlist PV results almost everywhere (shortlist fidelity
    ≥ 0.997 measured at the bench shape, scratch/approx_topk_probe.json);
    both re-rank exactly, so any disagreement is a shortlist miss."""
    from postgres_word2vec_tpu.models.pq import PQIndex

    n, d, B, k = 40_960, 96, 32, 10
    v = rng.normal(size=(n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    vj = jnp.asarray(v)
    pq = PQIndex.build(jax.random.PRNGKey(0), vj, m=12, k=64,
                       train_size=8192, iters=5)
    q = vj[:B]
    _, i_e = pq.search_pv(q, k, pvf=20, vectors=vj, shortlist="exact")
    _, i_a = pq.search_pv(q, k, pvf=20, vectors=vj, shortlist="approx")
    i_e, i_a = np.asarray(i_e), np.asarray(i_a)
    agree = np.mean([len(set(a) & set(e)) / k for a, e in zip(i_a, i_e)])
    assert agree >= 0.95, f"approx-shortlist PV agreement {agree:.3f}"
