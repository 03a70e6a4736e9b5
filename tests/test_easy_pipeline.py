"""End-to-end easy tier on a tiny synthetic dataset: file contract + quality."""
import json
from pathlib import Path

import numpy as np
import pytest

from vae_hmc_tpu.core.config import (DenseVaeConfig, KMeansConfig, MfccConfig,
                                     TsneConfig, Workspace)
from vae_hmc_tpu.pipelines import easy
from vae_hmc_tpu.pipelines.sources import SyntheticSource


@pytest.fixture(scope="module")
def easy_run(tmp_path_factory):
    ws = Workspace(tmp_path_factory.mktemp("easy_ws"))
    source = SyntheticSource.make(n_tracks=48, seed=0)
    mfcc_cfg = MfccConfig(duration_s=2.0)         # short clips for CPU speed
    vae_cfg = DenseVaeConfig(latent_dim=8, epochs=6, batch_size=16)
    km_cfg = KMeansConfig(n_clusters=6, n_init=4)
    out = easy.run_easy_pipeline(source, ws, mfcc_cfg, vae_cfg, km_cfg,
                                 with_viz=False, device_batch=16)
    return ws, source, out


def test_artifact_contract(easy_run):
    ws, _, _ = easy_run
    expected = [
        "results/vae_basic/latent_mu.npy",
        "results/vae_basic/track_ids.npy",
        "results/vae_basic/history.json",
        "results/vae_basic/train_config.json",
        "results/vae_basic/scaler.joblib",
        "results/vae_basic/mfcc_features_cache.npy",
        "results/vae_basic/vae_basic.pt",
        "results/kmeans_vae/labels_vae_kmeans.npy",
        "results/kmeans_vae/kmeans_vae_centers.npy",
        "results/kmeans_vae/track_ids.npy",
        "results/kmeans_vae/kmeans_vae_summary.json",
        "results/compare_metrics/metrics.csv",
        "results/compare_metrics/metrics_report.json",
        "results/compare_metrics/labels_pca_mfcc.npy",
        "results/compare_metrics/labels_pca_latents.npy",
    ]
    for rel in expected:
        assert (Path(ws.root) / rel).exists(), f"missing artifact: {rel}"


def test_shapes_and_alignment(easy_run):
    ws, source, out = easy_run
    z = np.load(Path(ws.root) / "results/vae_basic/latent_mu.npy")
    ids = np.load(Path(ws.root) / "results/vae_basic/track_ids.npy")
    labels = np.load(Path(ws.root) / "results/kmeans_vae/labels_vae_kmeans.npy")
    assert z.shape == (48, 8)
    assert ids.shape == (48,)
    assert labels.shape == (48,)
    assert set(ids) == set(int(t) for t in source.track_ids)


def test_history_decreases(easy_run):
    ws, _, _ = easy_run
    hist = json.loads((Path(ws.root) / "results/vae_basic/history.json").read_text())
    assert hist["total"][-1] < hist["total"][0]
    assert len(hist["epoch"]) == 6


def test_summary_distribution_sums_to_n(easy_run):
    ws, _, _ = easy_run
    summ = json.loads(
        (Path(ws.root) / "results/kmeans_vae/kmeans_vae_summary.json").read_text())
    assert sum(summ["label_distribution"].values()) == 48
    assert summ["vae_latent_shape"] == [48, 8]


def test_metrics_csv_rows(easy_run):
    ws, _, out = easy_run
    text = (Path(ws.root) / "results/compare_metrics/metrics.csv").read_text()
    lines = text.strip().split("\n")
    assert lines[0].startswith("method,input,input_dim,k,silhouette")
    assert len(lines) == 4   # header + VAE + PCA(mfcc) + PCA(latents)
    # clusterable synthetic data -> positive silhouette for VAE arm
    sil = float(lines[1].split(",")[4])
    assert np.isfinite(sil)


def test_checkpoint_roundtrip(easy_run):
    ws, _, out = easy_run
    from vae_hmc_tpu.core.artifacts import load_checkpoint
    flat, meta = load_checkpoint(Path(ws.root) / "results/vae_basic/vae_basic.pt")
    assert meta["config"]["latent_dim"] == 8
    assert any("enc1" in k for k in flat)
