"""sklearn parity for silhouette/DBI/CH/ARI/NMI + reference-purity semantics."""
import numpy as np
import pytest
from sklearn import metrics as skm

from vae_hmc_tpu import metrics as m


@pytest.fixture(scope="module")
def blobs(rng):
    n, d, k = 300, 12, 4
    centers = rng.normal(0, 5, (k, d))
    labels = rng.integers(0, k, n)
    x = centers[labels] + rng.normal(0, 1.0, (n, d))
    return x.astype(np.float32), labels, rng.integers(0, k, n)


def test_silhouette_parity(blobs):
    x, labels, _ = blobs
    ours = m.silhouette(x, labels)
    ref = skm.silhouette_score(x, labels)
    assert abs(ours - ref) < 5e-4


def test_silhouette_parity_highdim(rng):
    # mimics the mel-flat case: high-dim, f32 cancellation risk
    x = rng.normal(0, 1, (120, 2000)).astype(np.float32) + 5.0
    labels = rng.integers(0, 5, 120)
    ours = m.silhouette(x, labels)
    ref = skm.silhouette_score(x, labels)
    assert abs(ours - ref) < 5e-4


def test_davies_bouldin_parity(blobs):
    x, labels, _ = blobs
    assert abs(m.davies_bouldin(x, labels) - skm.davies_bouldin_score(x, labels)) < 1e-4


def test_calinski_harabasz_parity(blobs):
    x, labels, _ = blobs
    ref = skm.calinski_harabasz_score(x, labels)
    assert abs(m.calinski_harabasz(x, labels) - ref) / ref < 1e-4


def test_ari_parity(blobs):
    _, a, b = blobs
    assert abs(m.adjusted_rand_index(a, b) - skm.adjusted_rand_score(a, b)) < 1e-12
    assert abs(m.adjusted_rand_index(a, a) - 1.0) < 1e-12


def test_ari_with_noise_labels(blobs):
    _, a, b = blobs
    a2 = a.copy()
    a2[:30] = -1  # DBSCAN noise kept as ordinary label (ref scripts/13:103-111)
    assert abs(m.adjusted_rand_index(a2, b) - skm.adjusted_rand_score(a2, b)) < 1e-12


def test_nmi_parity(blobs):
    _, a, b = blobs
    assert abs(m.normalized_mutual_info(a, b)
               - skm.normalized_mutual_info_score(a, b)) < 1e-10


def test_purity_crosstab_semantics():
    clusters = np.array([0, 0, 0, 1, 1, 1])
    truth = np.array(["a", "a", "b", "b", "b", "c"])
    # cluster0: majority a (2), cluster1: majority b (2) -> 4/6
    assert abs(m.purity(clusters, truth) - 4 / 6) < 1e-12


def test_safe_wrappers_noise_conventions(blobs):
    x, labels, _ = blobs
    noisy = labels.copy()
    noisy[:50] = -1
    keep = noisy != -1
    assert abs(m.safe_silhouette(x, noisy)
               - skm.silhouette_score(x[keep], noisy[keep])) < 1e-4
    assert m.safe_silhouette(x, np.zeros(len(x), int)) is None  # 1 cluster
    assert abs(m.safe_davies_bouldin(x, noisy)
               - skm.davies_bouldin_score(x[keep], noisy[keep])) < 1e-4


def test_singleton_cluster_silhouette(rng):
    x = rng.normal(0, 1, (20, 3)).astype(np.float32)
    labels = np.zeros(20, int)
    labels[0] = 1  # singleton
    labels[10:] = 2
    ours = m.silhouette(x, labels)
    ref = skm.silhouette_score(x, labels)
    assert abs(ours - ref) < 1e-4


def test_masked_silhouette_from_dists_matches_subset(blobs):
    """Device noise-masked silhouette == sklearn on the noise-dropped subset."""
    import jax.numpy as jnp
    from vae_hmc_tpu.metrics.internal import (pairwise_sq_dists,
                                              silhouette_from_dists_masked)
    x, labels, _ = blobs
    noisy = labels.copy().astype(np.int64)
    noisy[::7] = -1
    xc = x - x.mean(axis=0)
    d = np.sqrt(np.asarray(pairwise_sq_dists(jnp.asarray(xc))))
    ours = silhouette_from_dists_masked(d, noisy)
    keep = noisy != -1
    ref = skm.silhouette_score(x[keep], noisy[keep])
    assert abs(ours - ref) < 5e-4


def test_masked_dbi_matches_subset(blobs):
    """Device noise-masked DBI == sklearn on the noise-dropped subset
    (no host subsetting of x — the sweep's per-cell path)."""
    from vae_hmc_tpu.metrics.internal import davies_bouldin_masked
    x, labels, _ = blobs
    noisy = labels.copy().astype(np.int64)
    noisy[::5] = -1
    keep = noisy != -1
    ours = davies_bouldin_masked(x, noisy)
    ref = skm.davies_bouldin_score(x[keep], noisy[keep])
    assert abs(ours - ref) < 1e-4
    # no noise at all: must equal the plain DBI
    assert abs(davies_bouldin_masked(x, labels)
               - skm.davies_bouldin_score(x, labels)) < 1e-4
