import jax.numpy as jnp
import numpy as np

from postgres_word2vec_tpu.ops import topk


def test_top_k_smallest_matches_sort(rng):
    d = rng.normal(size=(4, 50)).astype(np.float32)
    vals, idx = topk.top_k_smallest(jnp.asarray(d), 7)
    order = np.argsort(d, axis=-1)[:, :7]
    np.testing.assert_allclose(np.asarray(vals),
                               np.take_along_axis(d, order, -1), rtol=1e-6)
    np.testing.assert_allclose(np.take_along_axis(d, np.asarray(idx), -1),
                               np.take_along_axis(d, order, -1), rtol=1e-6)


def test_merge_top_k(rng):
    a = rng.normal(size=(3, 5)).astype(np.float32)
    b = rng.normal(size=(3, 4)).astype(np.float32)
    ia = np.arange(5)[None, :].repeat(3, 0)
    ib = (np.arange(4) + 100)[None, :].repeat(3, 0)
    vals, idx = topk.merge_top_k_smallest(
        jnp.asarray(a), jnp.asarray(ia), jnp.asarray(b), jnp.asarray(ib), 6)
    both = np.concatenate([a, b], -1)
    want = np.sort(both, -1)[:, :6]
    np.testing.assert_allclose(np.asarray(vals), want, rtol=1e-6)


def test_chunked_top_k_equals_global(rng):
    n, chunk = 1000, 128
    d = rng.normal(size=(2, n)).astype(np.float32)
    pad = (-n) % chunk
    dp = np.pad(d, ((0, 0), (0, pad)), constant_values=np.inf)

    def score_chunk(start):
        return jnp.asarray(dp)[:, start:start + chunk] \
            if isinstance(start, int) else jnp.take(
                jnp.asarray(dp), start + jnp.arange(chunk), axis=1)

    vals, idx = topk.chunked_top_k_smallest(score_chunk, n + pad, chunk, 10,
                                            (2,))
    want_idx = np.argsort(d, -1)[:, :10]
    np.testing.assert_allclose(np.asarray(vals),
                               np.take_along_axis(d, want_idx, -1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_blockwise_top_k_exact(rng):
    from postgres_word2vec_tpu.ops.topk import _blockwise_top_k_smallest
    d = rng.normal(size=(3, 20000)).astype(np.float32)
    vals, idx = _blockwise_top_k_smallest(jnp.asarray(d), 7, block=512)
    order = np.argsort(d, -1)[:, :7]
    np.testing.assert_allclose(np.asarray(vals),
                               np.take_along_axis(d, order, -1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), order)


def test_blockwise_top_k_with_inf_padding(rng):
    from postgres_word2vec_tpu.ops.topk import _blockwise_top_k_smallest
    d = rng.normal(size=(2, 1000)).astype(np.float32)   # 1000 % 512 != 0
    vals, idx = _blockwise_top_k_smallest(jnp.asarray(d), 5, block=512)
    order = np.argsort(d, -1)[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), order)


def test_top_k_smallest_wide_rows_use_blockwise(rng):
    d = rng.normal(size=(2, 70000)).astype(np.float32)
    vals, idx = topk.top_k_smallest(jnp.asarray(d), 9)
    order = np.argsort(d, -1)[:, :9]
    np.testing.assert_array_equal(np.asarray(idx), order)


def test_use_blockwise_routing_rule():
    """The exact-path routing rule fit to the on-chip grid
    (scratch/topk_grid.json; reports/R4_REGRESSION_NOTE.md): CPU takes
    blockwise for any row >= 64k; TPU only at k>=192 when the row is >=2M
    or k>=512 — native lax.top_k won 2-8x at k<=50 everywhere, and the
    blockwise-everywhere switch was round 3's PQ scan-family regression."""
    from postgres_word2vec_tpu.ops.topk import _use_blockwise

    # narrow rows and huge k never take blockwise
    assert not _use_blockwise(4096, 10, is_tpu=False)
    assert not _use_blockwise(3_072_000, 10_000, is_tpu=True)
    # CPU: any wide row
    assert _use_blockwise(65_536, 5, is_tpu=False)
    assert _use_blockwise(3_072_000, 200, is_tpu=False)
    # TPU: the measured win regions only
    assert not _use_blockwise(3_072_000, 10, is_tpu=True)    # r3 regression
    assert not _use_blockwise(102_400, 200, is_tpu=True)     # native 67 vs 70
    assert not _use_blockwise(1_048_576, 200, is_tpu=True)   # native 213 vs 219
    assert _use_blockwise(3_072_000, 200, is_tpu=True)       # block 519 vs 574
    assert _use_blockwise(102_400, 1000, is_tpu=True)        # block 80 vs 119
    assert _use_blockwise(3_072_000, 1000, is_tpu=True)      # block 699 vs 1007
