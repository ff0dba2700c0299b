import jax
import jax.numpy as jnp
import numpy as np

from postgres_word2vec_tpu.ops import kmeans


def test_pairwise_sqdist_matches_numpy(rng):
    x = rng.normal(size=(20, 8)).astype(np.float32)
    c = rng.normal(size=(5, 8)).astype(np.float32)
    got = np.asarray(kmeans.pairwise_sqdist(jnp.asarray(x), jnp.asarray(c)))
    want = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_assign_matches_argmin_and_chunks(rng):
    x = rng.normal(size=(1000, 8)).astype(np.float32)
    c = rng.normal(size=(13, 8)).astype(np.float32)
    want = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1).argmin(-1)
    got = np.asarray(kmeans.assign(jnp.asarray(x), jnp.asarray(c)))
    got_chunked = np.asarray(kmeans.assign(jnp.asarray(x), jnp.asarray(c),
                                           chunk_size=96))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got_chunked, want)


def test_kmeans_reduces_inertia_and_recovers_clusters(rng):
    # 4 well-separated blobs.
    centers = np.array([[10, 0], [-10, 0], [0, 10], [0, -10]], np.float32)
    x = np.concatenate([c + rng.normal(scale=0.3, size=(100, 2))
                        for c in centers]).astype(np.float32)
    res = kmeans.kmeans(jax.random.PRNGKey(0), jnp.asarray(x), k=4, iters=10)
    cents = np.asarray(res.centroids)
    # every true center has a learned centroid within 0.5
    d = np.linalg.norm(centers[:, None, :] - cents[None, :, :], axis=-1)
    assert d.min(axis=1).max() < 0.5
    assert np.asarray(res.counts).sum() == 400


def test_kmeans_subspaces_and_encode(rng):
    x = rng.normal(size=(300, 12)).astype(np.float32)
    sub = kmeans.split_subspaces(jnp.asarray(x), 3)
    assert sub.shape == (3, 300, 4)
    np.testing.assert_allclose(np.asarray(sub[1]), x[:, 4:8])
    res = kmeans.kmeans_subspaces(jax.random.PRNGKey(1), sub, k=8, iters=5)
    assert res.centroids.shape == (3, 8, 4)
    codes = kmeans.encode_subspaces(jnp.asarray(x), res.centroids)
    assert codes.shape == (300, 3)
    assert codes.dtype == jnp.uint8
    # codes must be the per-subspace argmin
    for j in range(3):
        want = ((x[:, None, 4 * j:4 * j + 4]
                 - np.asarray(res.centroids)[j][None, :, :]) ** 2
                ).sum(-1).argmin(-1)
        np.testing.assert_array_equal(np.asarray(codes[:, j]), want)


def test_encode_int16_for_large_k(rng):
    x = rng.normal(size=(40, 4)).astype(np.float32)
    cb = jnp.asarray(rng.normal(size=(2, 300, 2)).astype(np.float32))
    codes = kmeans.encode_subspaces(jnp.asarray(x), cb)
    assert codes.dtype == jnp.int16


def test_encode_subspaces_chunked_matches_single(rng):
    """Exercises the lax.map multi-chunk path (a TPU backend miscompile of
    batched einsums inside lax.map motivated the per-subspace formulation —
    this guards the chunk-boundary behavior)."""
    x = rng.normal(size=(1000, 12)).astype(np.float32)
    cb = jnp.asarray(rng.normal(size=(3, 8, 4)).astype(np.float32))
    one = kmeans.encode_subspaces(jnp.asarray(x), cb, chunk_size=2048)
    many = kmeans.encode_subspaces(jnp.asarray(x), cb, chunk_size=128)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(many))


def test_encode_residual_subspaces_matches_manual(rng):
    x = rng.normal(size=(500, 12)).astype(np.float32)
    coarse = jnp.asarray(rng.normal(size=(7, 12)).astype(np.float32))
    assign = jnp.asarray(rng.integers(0, 7, size=(500,)).astype(np.int32))
    cb = jnp.asarray(rng.normal(size=(3, 8, 4)).astype(np.float32))
    got = kmeans.encode_residual_subspaces(jnp.asarray(x), coarse, assign,
                                           cb, chunk_size=128)
    resid = jnp.asarray(x) - jnp.take(coarse, assign, axis=0)
    want = kmeans.encode_subspaces(resid, cb, chunk_size=4096)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_assign_cells_chunked(rng):
    from postgres_word2vec_tpu.models.ivpq import assign_cells
    x = jnp.asarray(rng.normal(size=(700, 8)).astype(np.float32))
    cc = jnp.asarray(rng.normal(size=(2, 4, 4)).astype(np.float32))
    one = assign_cells(x, cc, chunk_size=4096)
    many = assign_cells(x, cc, chunk_size=128)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(many))
