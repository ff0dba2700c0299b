import jax
import jax.numpy as jnp
import numpy as np
import pytest

from postgres_word2vec_tpu.models.ivfadc import IVFADCIndex


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(3)
    v = rng.normal(size=(3000, 24)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return v


@pytest.fixture(scope="module")
def ivf(dataset):
    return IVFADCIndex.build(jax.random.PRNGKey(1), jnp.asarray(dataset),
                             m=6, k=16, k_coarse=20, train_size=None,
                             iters=8)


def _exact_ids(q, v, k):
    d = ((q[:, None, :] - v[None, :, :]) ** 2).sum(-1)
    return np.argsort(d, -1)[:, :k]


def test_csr_structure(ivf, dataset):
    off = np.asarray(ivf.cell_offsets)
    assert off[0] == 0 and off[-1] == 3000
    assert (np.diff(off) >= 0).all()
    # row_ids is a permutation
    assert sorted(np.asarray(ivf.row_ids).tolist()) == list(range(3000))
    # every sorted row's assignment matches its cell range
    assign = np.asarray(ivf.assignments)
    rid = np.asarray(ivf.row_ids)
    for c in range(ivf.num_cells):
        assert (assign[rid[off[c]:off[c + 1]]] == c).all()
    assert ivf.list_cap == np.diff(off).max()


def test_full_probe_equals_exhaustive_adc(ivf, dataset):
    """probing every cell must equal an exhaustive residual-ADC scan."""
    q = jnp.asarray(dataset[:4])
    d_all, i_all = ivf.search(q, 10, w=ivf.num_cells)
    # brute force: decode residual distances per row via LUTs
    from postgres_word2vec_tpu.ops import lut, adc
    coarse = np.asarray(ivf.coarse.centroids)
    assign = np.asarray(ivf.assignments)
    got_ids = np.asarray(i_all)
    # compute reference distances for the returned ids and verify they are
    # the global minimum of the per-row ADC distance.
    ref_d = np.zeros((4, 3000), np.float32)
    for b in range(4):
        resid = dataset[b][None, :] - coarse  # (C, d)
        luts = np.asarray(lut.build_luts(jnp.asarray(resid),
                                         ivf.codebook.centroids))  # (C,m,k)
        codes_unsorted = np.asarray(ivf.codes_sorted)[
            np.argsort(np.asarray(ivf.row_ids))]
        for i in range(3000):
            c = assign[i]
            ref_d[b, i] = sum(luts[c, j, codes_unsorted[i, j]]
                              for j in range(6))
    want = np.argsort(ref_d, -1)[:, :10]
    np.testing.assert_allclose(np.sort(np.asarray(d_all), -1),
                               np.sort(np.take_along_axis(ref_d, want, -1)),
                               rtol=1e-4, atol=1e-5)


def test_recall_improves_with_w(ivf, dataset):
    q = dataset[:30]
    exact = _exact_ids(q, dataset, 5)

    def recall(w):
        _, ids = ivf.search(jnp.asarray(q), 5, w=w)
        return sum(len(set(a) & set(e))
                   for a, e in zip(np.asarray(ids), exact)) / exact.size

    r1, r5, rall = recall(1), recall(5), recall(ivf.num_cells)
    assert r1 <= r5 + 0.05
    assert r5 > 0.3
    assert rall >= r5


def test_search_adaptive_fills_k(ivf, dataset):
    q = jnp.asarray(dataset[:8])
    d, i = ivf.search_adaptive(q, 5, w=1)
    assert (np.asarray(i) >= 0).all()
    assert np.isfinite(np.asarray(d)).all()


def test_search_pv(ivf, dataset):
    q = dataset[:16]
    exact = _exact_ids(q, dataset, 5)
    _, ids = ivf.search_pv(jnp.asarray(q), 5, pvf=10,
                           vectors=jnp.asarray(dataset), w=8)
    r = sum(len(set(a) & set(e))
            for a, e in zip(np.asarray(ids), exact)) / exact.size
    assert r > 0.6


def test_add_and_roundtrip(ivf, dataset, tmp_path):
    rng = np.random.default_rng(9)
    new = rng.normal(size=(7, 24)).astype(np.float32)
    new /= np.linalg.norm(new, axis=-1, keepdims=True)
    ivf2 = ivf.add(jnp.asarray(new))
    assert ivf2.size == ivf.size + 7
    assert np.asarray(ivf2.coarse.counts).sum() == 3007
    # new rows are findable
    d, i = ivf2.search_adaptive(jnp.asarray(new), 1, w=4)
    assert (np.asarray(i)[:, 0] >= 3000).mean() > 0.5

    p = tmp_path / "ivf.npz"
    ivf2.save(p)
    ivf3 = IVFADCIndex.load(p)
    assert ivf3.list_cap == ivf2.list_cap
    np.testing.assert_array_equal(np.asarray(ivf3.codes_sorted),
                                  np.asarray(ivf2.codes_sorted))
