"""KMeans parity vs sklearn: same-quality solutions (ARI + inertia), not bit-RNG."""
import numpy as np
import pytest
from sklearn.cluster import KMeans as SkKMeans
from sklearn.metrics import adjusted_rand_score

from vae_hmc_tpu.cluster.kmeans import kmeans, kmeans_fit_predict
from vae_hmc_tpu.core.config import KMeansConfig


def _blobs(rng, n=600, d=16, k=5, spread=0.8):
    centers = rng.normal(0, 5, (k, d))
    y = rng.integers(0, k, n)
    return (centers[y] + rng.normal(0, spread, (n, d))).astype(np.float32), y


def test_kmeans_recovers_blobs(rng):
    x, y = _blobs(rng)
    res = kmeans(x, KMeansConfig(n_clusters=5, n_init=10, seed=0))
    assert adjusted_rand_score(res.labels, y) > 0.98
    assert res.labels.shape == (len(x),)
    assert res.centers.shape == (5, 16)


def test_kmeans_matches_sklearn_quality(rng):
    x, _ = _blobs(rng, spread=1.5)
    res = kmeans(x, KMeansConfig(n_clusters=5, n_init=10, seed=0))
    sk = SkKMeans(n_clusters=5, n_init=10, random_state=42).fit(x)
    assert adjusted_rand_score(res.labels, sk.labels_) > 0.97
    assert res.inertia <= sk.inertia_ * 1.01


def test_kmeans_hard_overclustered(rng):
    """k > natural clusters still must match sklearn inertia-quality."""
    x, _ = _blobs(rng, n=400, k=3, spread=2.0)
    res = kmeans(x, KMeansConfig(n_clusters=8, n_init=20, seed=1))
    sk = SkKMeans(n_clusters=8, n_init=20, random_state=42).fit(x)
    assert res.inertia <= sk.inertia_ * 1.02
    assert len(np.unique(res.labels)) == 8  # no empty clusters survive


def test_kmeans_deterministic(rng):
    x, _ = _blobs(rng, n=200)
    a = kmeans_fit_predict(x, 4, n_init=5, seed=7)
    b = kmeans_fit_predict(x, 4, n_init=5, seed=7)
    np.testing.assert_array_equal(a, b)


def test_dynamic_k_matches_static_at_bucket_boundary(rng):
    """k == k_max: the dynamic-k bucketed program must reproduce the static
    program EXACTLY (same RNG stream, same candidate counts, the masking is
    inert) — the program-count cut cannot move published k=4/8 results."""
    import jax
    from vae_hmc_tpu.cluster.kmeans import _kmeans_impl, _kmeans_impl_dyn
    x, _ = _blobs(rng, n=300, k=4)
    key = jax.random.PRNGKey(3)
    for k in (4, 8):
        ls, cs, inert_s, _ = _kmeans_impl(x, key, k, 5, 300, 1e-4)
        ld, cd, inert_d, _ = _kmeans_impl_dyn(x, key, k, k, 5, 300, 1e-4)
        np.testing.assert_array_equal(np.asarray(ls), np.asarray(ld))
        np.testing.assert_allclose(np.asarray(cs), np.asarray(cd))
        assert float(inert_s) == float(inert_d)


def test_dynamic_k_bit_identical_below_bucket(rng):
    """k < k_max must ALSO reproduce the static program exactly: candidate
    uniforms are drawn at the bucket's trial count, but trials beyond
    sklearn's n_local_trials(k) are argmin-masked, and threefry uniforms
    have the prefix property — so the surviving trials see the static
    program's exact draws.  (Round-3 regression test: the first bucketing
    cut used n_local_trials(k_max) for every k in the bucket, which moved
    published non-boundary-k results, e.g. hard-tier k=6.)"""
    import jax
    from vae_hmc_tpu.cluster.kmeans import _kmeans_impl, _kmeans_impl_dyn
    x, _ = _blobs(rng, n=300, k=5)
    key = jax.random.PRNGKey(11)
    for k, k_max in ((5, 8), (6, 8), (3, 4)):
        ls, cs, inert_s, _ = _kmeans_impl(x, key, k, 5, 300, 1e-4)
        ld, cd, inert_d, _ = _kmeans_impl_dyn(x, key, k, k_max, 5, 300,
                                              1e-4)
        np.testing.assert_array_equal(np.asarray(ls), np.asarray(ld))
        np.testing.assert_allclose(np.asarray(cs), np.asarray(cd)[:k])
        # inertia reduces over a (N, k_max)-shaped program: last-ulp fp
        # noise vs the (N, k) static shape; labels/centers are exact
        np.testing.assert_allclose(float(inert_s), float(inert_d),
                                   rtol=1e-6)


def test_dynamic_k_nonbucket_quality(rng):
    """k < k_max (k=5 in the k_max=8 program): padding rows must be inert —
    exactly k clusters come out and quality still matches sklearn."""
    x, y = _blobs(rng, n=400, k=5)
    res = kmeans(x, KMeansConfig(n_clusters=5, n_init=10, seed=0))
    assert res.centers.shape == (5, x.shape[1])
    assert set(np.unique(res.labels)) == set(range(5))
    sk = SkKMeans(n_clusters=5, n_init=10, random_state=42).fit(x)
    assert res.inertia <= sk.inertia_ * 1.02


def test_repdata_kmeans_labels_memoized_and_exact(rng):
    """RepData.kmeans_labels (round 4): scripts 13/16/14/15 share one fit
    per (k, n_init, seed) cell — the memoized labels must be the SAME
    object on reuse and bit-identical to an independent kmeans fit on the
    same data."""
    from vae_hmc_tpu.cluster.kmeans import kmeans_fit_predict
    from vae_hmc_tpu.cluster.sweep import RepData

    x, _ = _blobs(rng, n=120, k=4)
    rep = RepData.build("r", x, None)
    a = rep.kmeans_labels(4, n_init=10, seed=42)
    b = rep.kmeans_labels(4, n_init=10, seed=42)
    assert a is b, "second call must return the memoized labels"
    fresh = kmeans_fit_predict(x, 4, n_init=10, seed=42)
    np.testing.assert_array_equal(np.asarray(a), fresh)
    # a different cell is a different cache entry, not a collision
    c = rep.kmeans_labels(3, n_init=10, seed=42)
    assert c is not a
    np.testing.assert_array_equal(
        np.asarray(c), kmeans_fit_predict(x, 3, n_init=10, seed=42))
