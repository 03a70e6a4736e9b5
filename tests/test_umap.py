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


def test_edge_weights_match_dense_path(rng):
    """The edge-wise fuzzy union (_edge_weights, the hot path — no dense W)
    must reproduce _edge_list(_build_w(...)) element-for-element: same
    layout, same weights, same mutual-pair zeroing."""
    import jax.numpy as jnp
    from vae_hmc_tpu.viz.umap import (_build_w, _edge_list, _edge_weights,
                                      _knn, _smooth_knn)

    x = jnp.asarray(rng.normal(0, 1, (60, 4)).astype(np.float32))
    knn_d, knn_i = _knn(x, 8)
    rho, sigma = _smooth_knn(knn_d)
    W = _build_w(knn_d, knn_i, rho, sigma)
    h_ref, t_ref, w_ref = map(np.asarray, _edge_list(W, knn_i))
    h, t, w = map(np.asarray, _edge_weights(knn_d, knn_i, rho, sigma))
    np.testing.assert_array_equal(h, h_ref)
    np.testing.assert_array_equal(t, t_ref)
    np.testing.assert_allclose(w, w_ref, atol=1e-6)


def test_spectral_init_sparse_matches_dense(rng):
    """Sparse (edge-list matvec) spectral init is the SAME deflated
    subspace iteration as the dense n>512 path (ops/subspace
    topk_eigh_deflated: same seed, same m, same Löwdin/deflate schedule) —
    only A·V changes from a dense matmul to gather+segment-sum.  Compare
    the top-2 subspaces by principal angles (rotation within a
    near-degenerate pair is arbitrary; exact-eigh is NOT the oracle here —
    both iterative paths resolve degenerate pairs identically)."""
    import jax.numpy as jnp
    from vae_hmc_tpu.ops.subspace import topk_eigh_deflated
    from vae_hmc_tpu.viz.umap import (_build_w, _edge_weights, _knn,
                                      _smooth_knn, _spectral_init_sparse)

    x = jnp.asarray(
        np.concatenate([rng.normal(0, 1, (40, 4)),
                        rng.normal(6, 1, (40, 4))]).astype(np.float32))
    knn_d, knn_i = _knn(x, 8)
    rho, sigma = _smooth_knn(knn_d)
    W = _build_w(knn_d, knn_i, rho, sigma)
    heads, tails, weights = _edge_weights(knn_d, knn_i, rho, sigma)
    n = int(x.shape[0])
    d = jnp.maximum(jnp.sum(W, axis=1), 1e-8)
    inv_sqrt = 1.0 / jnp.sqrt(d)
    S = inv_sqrt[:, None] * W * inv_sqrt[None, :]
    _, y_dense = topk_eigh_deflated(S + jnp.eye(n), jnp.sqrt(d), 2)
    y_sparse = np.asarray(_spectral_init_sparse(heads, tails, weights, n))
    qd, _ = np.linalg.qr(np.asarray(y_dense))
    qs, _ = np.linalg.qr(y_sparse)
    sv = np.linalg.svd(qd.T @ qs, compute_uv=False)   # cos principal angles
    np.testing.assert_allclose(sv, 1.0, atol=1e-3)


def test_umap_from_dists_matches_umap_2d(blobs3):
    """The from-dists entry with the exact distance matrix of x must equal
    umap_2d(x) (same chain from the kNN stage on; same key)."""
    import jax.numpy as jnp
    from vae_hmc_tpu.metrics.internal import pairwise_sq_dists
    from vae_hmc_tpu.viz.umap import umap_2d, umap_2d_from_dists

    x, _ = blobs3
    d = jnp.sqrt(pairwise_sq_dists(jnp.asarray(x, jnp.float32)))
    a = umap_2d(x, n_epochs=60)
    b = umap_2d_from_dists(d, n_epochs=60)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_umap_batch_matches_per_call(blobs3, rng):
    """The vmapped batch program runs the SAME chain as per-call from-dists
    embeddings.  Coordinates are not comparable bit-wise: the spectral
    init's top-2 eigenpair can be near-degenerate and the batched eigh
    resolves the in-subspace rotation differently than the single one
    (measured: identical principal angles, rotated basis) — UMAP's
    documented contract is structural equivalence, so the gate is
    trustworthiness + cluster recovery matching the per-call embedding."""
    import jax.numpy as jnp
    from sklearn.manifold import trustworthiness
    from sklearn.metrics import adjusted_rand_score

    from vae_hmc_tpu.cluster.kmeans import kmeans_fit_predict
    from vae_hmc_tpu.metrics.internal import pairwise_sq_dists
    from vae_hmc_tpu.viz.umap import (umap_2d_from_dists,
                                      umap_2d_from_dists_batch)

    x1, y1 = blobs3
    centers = rng.normal(0, 8, (3, 10))
    y2 = np.repeat(np.arange(3), 60)
    x2 = (centers[y2] + rng.normal(0, 0.8, (180, 10))).astype(np.float32)
    ds = [jnp.sqrt(pairwise_sq_dists(jnp.asarray(v, jnp.float32)))
          for v in (x1, x2)]
    batch = umap_2d_from_dists_batch(ds, n_epochs=200)
    assert batch.shape == (2, 180, 2)
    assert np.isfinite(batch).all()
    for i, (x, y) in enumerate(((x1, y1), (x2, y2))):
        single = umap_2d_from_dists(ds[i], n_epochs=200)
        t_b = trustworthiness(x, batch[i], n_neighbors=10)
        t_s = trustworthiness(x, single, n_neighbors=10)
        assert t_b > 0.9 and t_b > t_s - 0.03
        yhat = kmeans_fit_predict(batch[i], 3, n_init=5, seed=0)
        assert adjusted_rand_score(y, yhat) > 0.95
