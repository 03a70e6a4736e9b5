"""t-SNE quality, projection dispatch, plot writers."""
from pathlib import Path

import numpy as np
import pytest

from vae_hmc_tpu.core.config import TsneConfig
from vae_hmc_tpu.viz import plots
from vae_hmc_tpu.viz.projections import HAVE_UMAP, reduce_2d
from vae_hmc_tpu.viz.tsne import tsne


@pytest.fixture(scope="module")
def clustered():
    # own seeded generator: the shared session rng's state depends on which
    # other test files ran first, which made this data (and the t-SNE
    # separation ratio) order-dependent
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 8, (3, 10))
    y = np.repeat(np.arange(3), 40)
    x = (centers[y] + rng.normal(0, 1.0, (120, 10))).astype(np.float32)
    return x, y


def test_tsne_preserves_cluster_structure(clustered):
    x, y = clustered
    xy = tsne(x, TsneConfig(n_iter=800, perplexity=15))
    assert xy.shape == (120, 2)
    # clusters must be separated in the embedding: mean intra-cluster
    # distance far below mean inter-cluster distance
    intra, inter = [], []
    for i in range(3):
        pts = xy[y == i]
        intra.append(np.linalg.norm(pts - pts.mean(0), axis=1).mean())
        for j in range(i + 1, 3):
            inter.append(np.linalg.norm(xy[y == i].mean(0) - xy[y == j].mean(0)))
    assert np.mean(inter) > 3 * np.mean(intra)


def test_tsne_deterministic(clustered):
    x, _ = clustered
    a = tsne(x, TsneConfig(n_iter=100))
    b = tsne(x, TsneConfig(n_iter=100))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_reduce_2d_umap_fallback(clustered):
    """Without umap installed, 'umap' silently falls back to t-SNE (ref
    scripts/08:14-18)."""
    x, _ = clustered
    xy, used = reduce_2d(x, "umap", tsne_cfg=TsneConfig(n_iter=50))
    assert used == ("umap" if HAVE_UMAP else "tsne")
    assert xy.shape == (120, 2)


def test_reduce_2d_pre_pca(rng):
    x = rng.normal(0, 1, (60, 200)).astype(np.float32)
    xy, used = reduce_2d(x, "tsne", tsne_cfg=TsneConfig(n_iter=50),
                         pre_pca_dim=20)
    assert xy.shape == (60, 2)


def test_plot_writers(tmp_path, clustered, rng):
    x, y = clustered
    xy = x[:, :2]
    p1 = plots.scatter_2d(xy, y, tmp_path / "s.png", "t")
    p2 = plots.scatter_2d(xy, np.where(y == 0, -1, y), tmp_path / "n.png",
                          "t", noise_as_x=True)
    p3 = plots.training_curves(
        [{"epoch": 1, "total": 1.0, "recon": 0.8, "kl": 0.2},
         {"epoch": 2, "total": 0.9, "recon": 0.7, "kl": 0.2}],
        tmp_path / "c.png")
    p4 = plots.grouped_bars(
        [{"m": "a", "s": 0.3, "n": 0.1}, {"m": "b", "s": 0.5, "n": None}],
        "m", ["s", "n"], tmp_path / "b.png", "t")
    p5 = plots.stacked_bar_distribution(
        np.array([[3, 1], [2, 4]]), ["c0", "c1"], ["g0", "g1"],
        tmp_path / "st.png", "t")
    p6 = plots.line_sweep([0.1, 0.2], [5, 3], tmp_path / "l.png", "x", "y", "t")
    p7 = plots.pca_variance_plot(np.array([0.5, 0.3, 0.1]),
                                 tmp_path / "v.png", "t")
    p8 = plots.recon_overlay(rng.normal(0, 1, (3, 20)),
                             rng.normal(0, 1, (3, 20)), tmp_path / "r.png")
    for p in (p1, p2, p3, p4, p5, p6, p7, p8):
        assert Path(p).exists() and Path(p).stat().st_size > 1000
