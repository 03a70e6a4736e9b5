"""First-party on-device UMAP tests.

umap-learn is not installed here (it is the reference's optional host
dependency), so the oracle is structural: the embedding must preserve
local neighborhoods (sklearn trustworthiness) and keep well-separated
clusters separated (KMeans on the 2-D embedding recovers the generating
labels).  find_ab_params is checked against umap-learn's published values
for its default (spread=1, min_dist=0.1): a=1.57694, b=0.89506.
"""
import numpy as np
import pytest

from vae_hmc_tpu.viz.umap import find_ab_params, fuzzy_simplicial_set, umap_2d


def test_find_ab_params_matches_umap_learn_defaults():
    a, b = find_ab_params(1.0, 0.1)
    assert a == pytest.approx(1.57694, abs=2e-3)
    assert b == pytest.approx(0.89506, abs=2e-3)


def test_fuzzy_set_is_symmetric_probability_graph(rng):
    x = rng.normal(0, 1, (80, 5)).astype(np.float32)
    W = np.asarray(fuzzy_simplicial_set(x, 10))
    assert W.shape == (80, 80)
    np.testing.assert_allclose(W, W.T, atol=1e-6)
    assert W.min() >= 0.0 and W.max() <= 1.0 + 1e-6
    assert np.allclose(np.diag(W), 0.0)
    # every row has at least its nearest neighbor at full membership
    assert (W.max(axis=1) > 0.99).all()


@pytest.fixture(scope="module")
def blobs3():
    rng = np.random.default_rng(0)
    centers = rng.normal(0, 8, (3, 10))
    y = np.repeat(np.arange(3), 60)
    x = (centers[y] + rng.normal(0, 0.8, (180, 10))).astype(np.float32)
    return x, y


def test_umap_preserves_structure(blobs3):
    from sklearn.manifold import trustworthiness
    x, y = blobs3
    emb = umap_2d(x, n_neighbors=12, n_epochs=200, seed=0)
    assert emb.shape == (180, 2)
    assert np.isfinite(emb).all()
    assert trustworthiness(x, emb, n_neighbors=10) > 0.9


def test_umap_separates_clusters(blobs3):
    from sklearn.metrics import adjusted_rand_score

    from vae_hmc_tpu.cluster.kmeans import kmeans_fit_predict
    x, y = blobs3
    emb = umap_2d(x, n_neighbors=12, n_epochs=200, seed=0)
    yhat = kmeans_fit_predict(emb, 3, n_init=5, seed=0)
    assert adjusted_rand_score(y, yhat) > 0.95


def test_reduce_2d_uses_first_party_umap(blobs3):
    from vae_hmc_tpu.viz.projections import HAVE_UMAP, reduce_2d
    x, _ = blobs3
    assert HAVE_UMAP          # first-party: always available
    xy, used = reduce_2d(x, "umap")
    assert used == "umap"
    assert xy.shape == (len(x), 2)


def test_edge_list_covers_symmetric_graph_once(rng):
    """The fixed-shape edge list == the COO walk of the dense fuzzy union:
    every nonzero directed pair appears with its Wsym weight exactly once
    (mutual-kNN reverse copies are weight-zeroed, not duplicated)."""
    import jax.numpy as jnp
    from vae_hmc_tpu.viz.umap import _build_w, _edge_list, _knn, _smooth_knn

    x = jnp.asarray(rng.normal(0, 1, (60, 4)).astype(np.float32))
    knn_d, knn_i = _knn(x, 8)
    rho, sigma = _smooth_knn(knn_d)
    W = np.asarray(_build_w(knn_d, knn_i, rho, sigma))
    heads, tails, weights = map(np.asarray, _edge_list(jnp.asarray(W),
                                                       knn_i))
    assert heads.shape == (2 * 60 * 8,)
    dense = np.zeros_like(W)
    np.add.at(dense, (heads, tails), weights)       # duplicates would sum
    np.testing.assert_allclose(dense, W, atol=1e-6)
