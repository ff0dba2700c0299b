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
