"""End-to-end medium tier on a tiny synthetic dataset."""
from pathlib import Path

import numpy as np
import pytest

from vae_hmc_tpu.core.config import (ConvMMVaeConfig, MelConfig, SweepConfig,
                                     TextEmbedConfig, Workspace)
from vae_hmc_tpu.pipelines import medium
from vae_hmc_tpu.pipelines.sources import SyntheticSource


@pytest.fixture(scope="module")
def medium_run(tmp_path_factory):
    ws = Workspace(tmp_path_factory.mktemp("medium_ws"))
    source = SyntheticSource.make(n_tracks=36, seed=1, lyrics_coverage=0.8)
    mel_cfg = MelConfig(duration_s=1.5, n_mels=32)     # tiny images for CPU
    vae_cfg = ConvMMVaeConfig(epochs=2, batch_size=12, latent_dim=8,
                              audio_fc_dim=32)
    sweep_cfg = SweepConfig(ks=(4, 6), dbscan_eps=(0.5, 1.0),
                            dbscan_min_samples=(3, 5))
    out = medium.run_medium_pipeline(source, ws, mel_cfg,
                                     TextEmbedConfig(), vae_cfg, sweep_cfg,
                                     with_viz=True, device_batch=12)
    return ws, source, out


def test_medium_artifact_contract(medium_run):
    ws, _, _ = medium_run
    expected = [
        "data/audio_cnn_mel_X.npy",
        "data/audio_cnn_mel_track_ids.npy",
        "results/audio_cnn_mel_build_report.csv",
        "data/lyrics_embeddings.npy",
        "data/lyrics_track_ids.npy",
        "results/lyrics_embedding_report.csv",
        "results/vae_conv_mm_medium/train_log.csv",
        "data/vae_mm_latents_mu.npy",
        "data/vae_mm_latents_track_ids.npy",
        "results/medium_clustering_metrics_all.csv",
        "results/medium_full_sweep_metrics.csv",
        "results/medium_full_sweep_best_by_representation.csv",
        "results/medium_full_sweep_best_overall.csv",
        "results/report_medium/best_filtered.csv",
        "results/report_medium/best_filtered_by_representation.csv",
        "results/cluster_viz/side_by_side_medium.png",
        "results/cluster_viz/lyrics_dbscan_eps_sweep_clusters_medium.png",
        "results/cluster_viz/lyrics_dbscan_eps_sweep_noise_medium.png",
    ]
    for rel in expected:
        assert (Path(ws.root) / rel).exists(), f"missing artifact: {rel}"


def test_mel_feature_shape(medium_run):
    ws, source, _ = medium_run
    x = np.load(Path(ws.root) / "data/audio_cnn_mel_X.npy")
    cfg = MelConfig(duration_s=1.5, n_mels=32)
    assert x.shape == (36, 1, 32, cfg.n_frames)
    assert x.dtype == np.float32
    # per-sample standardization: each spectrogram ~zero-mean unit-std
    flat = x.reshape(36, -1)
    np.testing.assert_allclose(flat.mean(axis=1), 0.0, atol=1e-3)
    np.testing.assert_allclose(flat.std(axis=1), 1.0, atol=1e-2)


def test_lyrics_alignment_mask(medium_run):
    ws, source, out = medium_run
    mask = out["train"]["lyrics_mask"]
    l_ids = np.load(Path(ws.root) / "data/lyrics_track_ids.npy")
    # rows with lyrics -> mask 1, without -> 0
    assert mask.sum() == len(l_ids)
    assert set(np.asarray(mask)) <= {0.0, 1.0}


def test_sweep_row_count(medium_run):
    _, _, out = medium_run
    # per rep: 2 ks x 2 algos + 2 eps x 2 ms = 8; 3 reps = 24
    assert len(out["sweep"]) == 24
    for row in out["sweep"]:
        assert set(row) >= {"representation", "algo", "params", "score"}


def test_sweep_csv_schema(medium_run):
    ws, _, _ = medium_run
    lines = (Path(ws.root) / "results/medium_full_sweep_metrics.csv"
             ).read_text().strip().split("\n")
    assert lines[0] == ("representation,algo,params,n_clusters_found,n_noise,"
                        "noise_frac,silhouette,davies_bouldin,ari,score")
    assert len(lines) == 25


def test_suite_csv_schema(medium_run):
    ws, _, _ = medium_run
    lines = (Path(ws.root) / "results/medium_clustering_metrics_all.csv"
             ).read_text().strip().split("\n")
    assert lines[0] == ("representation,algo,params,n_clusters_found,n_noise,"
                        "silhouette,davies_bouldin,ari")
    # 3 reps x (kmeans + agglo + 5 dbscan eps) = 21 rows
    assert len(lines) == 22


def test_train_log_contract(medium_run):
    ws, _, _ = medium_run
    lines = (Path(ws.root) / "results/vae_conv_mm_medium/train_log.csv"
             ).read_text().strip().split("\n")
    assert lines[0] == "epoch,loss,recon,kl"
    assert len(lines) == 3  # 2 epochs


def test_latents_clusterable(medium_run):
    """Synthetic genres are separable: ARI of kmeans on latents vs genre > 0."""
    _, _, out = medium_run
    vae_rows = [r for r in out["suite"]
                if r["representation"] == "vae_mm_latents"
                and r["algo"] == "kmeans"]
    assert vae_rows[0]["ari"] is not None
