"""Agglomerative ward + DBSCAN parity vs sklearn, and text-module parity."""
import numpy as np
import pytest
from sklearn.cluster import DBSCAN as SkDBSCAN
from sklearn.cluster import AgglomerativeClustering
from sklearn.metrics import adjusted_rand_score

from vae_hmc_tpu.cluster.agglomerative import agglomerative_ward
from vae_hmc_tpu.cluster.dbscan import dbscan, dbscan_sweep


def _blobs(rng, n=150, d=8, k=4, spread=0.8):
    centers = rng.normal(0, 5, (k, d))
    y = rng.integers(0, k, n)
    return (centers[y] + rng.normal(0, spread, (n, d))).astype(np.float32), y


def test_ward_matches_sklearn(rng):
    x, _ = _blobs(rng)
    for k in (2, 4, 6):
        ours = agglomerative_ward(x, k)
        sk = AgglomerativeClustering(n_clusters=k, linkage="ward").fit_predict(x)
        assert adjusted_rand_score(ours, sk) == pytest.approx(1.0), f"k={k}"


def test_ward_matches_sklearn_overlapping(rng):
    x, _ = _blobs(rng, n=120, spread=2.5)
    ours = agglomerative_ward(x, 5)
    sk = AgglomerativeClustering(n_clusters=5, linkage="ward").fit_predict(x)
    assert adjusted_rand_score(ours, sk) == pytest.approx(1.0)


def test_dbscan_matches_sklearn_exactly(rng):
    x, _ = _blobs(rng, n=200, spread=1.0)
    for eps, ms in [(1.5, 5), (2.5, 3), (4.0, 8), (0.5, 5)]:
        ours = dbscan(x, eps, ms)
        sk = SkDBSCAN(eps=eps, min_samples=ms).fit_predict(x)
        np.testing.assert_array_equal(ours, sk), f"eps={eps},ms={ms}"


def test_dbscan_sweep_consistent(rng):
    x, _ = _blobs(rng, n=120)
    grid = dbscan_sweep(x, [1.5, 3.0], [3, 5])
    for (eps, ms), labels in grid.items():
        np.testing.assert_array_equal(labels, dbscan(x, eps, ms))


def test_tfidf_matches_sklearn():
    from sklearn.feature_extraction.text import TfidfVectorizer as SkT
    from vae_hmc_tpu.text.tfidf import TfidfVectorizer

    docs = ["the cat sat on the mat", "dogs and cats living together",
            "mat cat cat dog", "completely unrelated words here",
            "the the the of of a an"]
    ours = TfidfVectorizer().fit_transform(docs)
    sk = SkT().fit_transform(docs).toarray()
    assert ours.shape == sk.shape
    np.testing.assert_allclose(ours, sk, atol=1e-6)

    ours2 = TfidfVectorizer(max_features=5, stop_words="english").fit_transform(docs)
    sk2 = SkT(max_features=5, stop_words="english").fit_transform(docs).toarray()
    np.testing.assert_allclose(ours2, sk2, atol=1e-6)


def test_langdetect_semantics():
    from vae_hmc_tpu.text.langdetect import detect_language_simple
    assert detect_language_simple("hello world") == "en"
    assert detect_language_simple("আমার সোনার বাংলা") == "bn"
    assert detect_language_simple("1234 !!!") == "other"
    assert detect_language_simple("") == "none"
    assert detect_language_simple(None) == "none"


def test_dbscan_vectorized_border_conflicts_match_sklearn(rng):
    """Overlapping dense blobs force border points adjacent to multiple
    clusters — the min-cluster-id rule must equal sklearn's seed-order BFS."""
    for trial in range(8):
        k = int(rng.integers(2, 5))
        centers = rng.normal(0, 3, (k, 2))
        y = rng.integers(0, k, 150)
        x = (centers[y] + rng.normal(0, 0.7, (150, 2))).astype(np.float32)
        for eps in (0.3, 0.6):
            for ms in (3, 5):
                ours = dbscan(x, eps, ms)
                sk = SkDBSCAN(eps=eps, min_samples=ms).fit_predict(x)
                np.testing.assert_array_equal(ours, sk)


def test_dbscan_device_labeling_matches_host_and_sklearn(rng):
    """The on-device labeling program (min-index propagation + device rank)
    must agree exactly with both the host sklearn-exact path and sklearn
    itself, including border-point ownership and noise."""
    import jax.numpy as jnp
    from sklearn.cluster import DBSCAN as SkDBSCAN

    from vae_hmc_tpu.cluster.dbscan import (dbscan_from_dists_device,
                                            labels_from_adjacency,
                                            neighbor_graph)
    from vae_hmc_tpu.metrics.internal import pairwise_sq_dists

    for trial in range(4):
        x = rng.normal(0, 1, (120, 4)).astype(np.float32)
        x[:40] += 4.0
        x[40:70] -= 4.0
        d = jnp.sqrt(pairwise_sq_dists(jnp.asarray(x)))
        for eps, ms in [(0.8, 3), (1.2, 5), (2.0, 4), (0.3, 2)]:
            dev = dbscan_from_dists_device(d, eps, ms)
            host = labels_from_adjacency(neighbor_graph(x, eps), ms)
            sk = SkDBSCAN(eps=eps, min_samples=ms).fit(x).labels_
            np.testing.assert_array_equal(dev, host)
            np.testing.assert_array_equal(dev, sk)


def test_dbscan_grid_matches_per_cell_and_sklearn():
    """The vmapped whole-grid labeler == the per-cell device labeler ==
    sklearn, for every (eps, min_samples) cell incl. all-noise ones."""
    import jax.numpy as jnp
    from sklearn.cluster import DBSCAN as SkDBSCAN

    from vae_hmc_tpu.cluster.dbscan import (dbscan_from_dists_device,
                                            dbscan_sweep_from_dists_device)
    from vae_hmc_tpu.metrics.internal import pairwise_sq_dists

    rng = np.random.default_rng(3)
    x = np.concatenate([rng.normal(0, 0.3, (40, 4)),
                        rng.normal(4, 0.3, (35, 4)),
                        rng.normal((0, 4, 0, 4), 0.3, (25, 4)),
                        rng.uniform(-3, 7, (20, 4))]).astype(np.float32)
    d = jnp.sqrt(pairwise_sq_dists(jnp.asarray(x)))
    eps_values, ms_values = [0.05, 0.5, 0.9, 1.5], [3, 5, 12]
    grid = dbscan_sweep_from_dists_device(d, eps_values, ms_values)
    assert len(grid) == 12
    for (eps, ms), lab in grid.items():
        per_cell = dbscan_from_dists_device(d, eps, ms)
        np.testing.assert_array_equal(lab, per_cell,
                                      err_msg=f"cell {(eps, ms)}")
        sk = SkDBSCAN(eps=eps, min_samples=ms).fit(x).labels_
        np.testing.assert_array_equal(lab, sk, err_msg=f"cell {(eps, ms)}")


def test_dbscan_threshold_band_refinement_matches_sklearn_f64():
    """Regression (round 4): a border pair whose true distance is just
    under eps but whose f32 dot-trick squared distance lands just OVER
    eps^2 (large coordinate offsets -> catastrophic cancellation).  sklearn
    (KDTree, f64 accumulation) keeps the edge; the naive f32 adjacency
    dropped it, flipping the border point to noise (first seen as a
    session-order failure: d=0.29999402 vs eps=0.3).  neighbor_graph must
    refine threshold-adjacent pairs in f64 (_refine_threshold_band)."""
    from sklearn.cluster import DBSCAN as SkDBSCAN

    from vae_hmc_tpu.cluster.dbscan import dbscan, dbscan_sweep
    from vae_hmc_tpu.metrics.internal import pairwise_sq_dists

    eps, ms = 0.3, 3
    # hardcoded flip pair (searched): f32 dot-trick d2 = 0.09082 > 0.09,
    # true f64 d2 = 0.0899977 <= 0.09
    c = np.asarray([43.38662338256836, 76.28477478027344], np.float32)
    b = np.asarray([43.57174301147461, 76.52084350585938], np.float32)
    x = np.stack([c, c + np.float32(0.01), c - np.float32(0.01), b])
    d2 = np.asarray(pairwise_sq_dists(x))
    true = float(((c.astype(np.float64) - b.astype(np.float64)) ** 2).sum())
    assert true <= eps * eps < d2[0, 3], \
        "construction no longer exercises the cancellation flip"
    sk = SkDBSCAN(eps=eps, min_samples=ms).fit_predict(x)
    assert sk[3] == 0, "sklearn must see b as a border point of c's cluster"
    np.testing.assert_array_equal(dbscan(x, eps, ms), sk)
    # the host sweep path shares the refined adjacency
    np.testing.assert_array_equal(
        dbscan_sweep(x, [eps], [ms])[(eps, ms)], sk)
