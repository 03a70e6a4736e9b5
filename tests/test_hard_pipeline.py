"""End-to-end hard tier on a tiny synthetic dataset, incl. CVAE + tags."""
import json
from pathlib import Path

import numpy as np
import pytest

from vae_hmc_tpu.core.config import (AeConfig, HardVaeConfig, MfccConfig,
                                     TextEmbedConfig, Workspace)
from vae_hmc_tpu.pipelines import hard
from vae_hmc_tpu.pipelines.sources import SyntheticSource


@pytest.fixture(scope="module")
def hard_run(tmp_path_factory):
    ws = Workspace(tmp_path_factory.mktemp("hard_ws"))
    source = SyntheticSource.make(n_tracks=36, seed=2, lyrics_coverage=0.85)
    mfcc_cfg = MfccConfig(duration_s=2.0, min_duration_s=1.0)
    vae_cfg = HardVaeConfig(hidden_dim=32, latent_dim=6, epochs=3,
                            batch_size=12, beta=4.0)
    ae_cfg = AeConfig(hidden_dim=32, latent_dim=6, epochs=3, batch_size=12)
    out = hard.run_hard_pipeline(source, ws, mfcc_cfg, TextEmbedConfig(),
                                 vae_cfg, ae_cfg, tag="beta_test",
                                 with_viz=True, device_batch=12)
    return ws, source, out


def test_hard_artifact_contract(hard_run):
    ws, _, _ = hard_run
    expected = [
        "data/hard/audio_mfcc_stats.npy",
        "data/hard/lyrics_emb.npy",
        "data/hard/track_ids.npy",
        "data/hard/genres.npy",
        "data/hard/genre_idx.npy",
        "data/hard/languages.npy",
        "data/hard/lang_idx.npy",
        "data/hard/hard_metadata.csv",
        "data/hard/build_info.json",
        "data/hard/latents_mu.npy",
        "data/hard/latents_mu_beta_test.npy",           # tag snapshot
        "models/hard/beta_vae_multimodal.pt",
        "results/hard/hard_metrics_vae_latents.json",
        "results/hard/hard_metrics_vae_latents_beta_test.json",
        "results/hard/cluster_composition_by_genre.csv",
        "results/hard/cluster_labels_kmeans.npy",
        "results/hard/cluster_distribution_genre_counts.csv",
        "results/hard/cluster_distribution_language_counts.csv",
        "results/hard/baseline_comparison.csv",
        "results/hard/plots/training_curve.png",
        "results/hard/plots/recon_examples.png",
        "results/hard/plots/latent_2d.npy",
        "results/hard/plots/latent_by_cluster.png",
        "results/hard/plots/latent_by_genre.png",
        "results/hard/plots/latent_by_language.png",
        "results/hard/plots/cluster_dist_over_genres.png",
        "results/hard/plots/cluster_dist_over_languages.png",
        "results/hard/plots/baseline_bars.png",
    ]
    for rel in expected:
        assert (Path(ws.root) / rel).exists(), f"missing artifact: {rel}"


def test_metrics_json_fields(hard_run):
    ws, _, out = hard_run
    m = json.loads((Path(ws.root) /
                    "results/hard/hard_metrics_vae_latents.json").read_text())
    assert set(m) == {"feature_space", "k", "silhouette", "nmi", "ari",
                      "purity"}
    assert m["k"] == 6
    assert 0.0 <= m["purity"] <= 1.0
    assert 0.0 <= m["nmi"] <= 1.0


def test_baseline_rows(hard_run):
    _, _, out = hard_run
    methods = [r["method"] for r in out["baselines"]]
    assert methods[0] == "VAE/CVAE latents + KMeans"
    assert methods[1] == "Direct spectral (MFCC stats) + KMeans"
    assert methods[2].startswith("PCA(")
    assert methods[3].startswith("Autoencoder(")


def test_idempotent_prepare(hard_run):
    ws, source, _ = hard_run
    again = hard.prepare_features(source, ws)
    assert again.get("skipped") is True


def test_cvae_variant(tmp_path):
    ws = Workspace(tmp_path)
    source = SyntheticSource.make(n_tracks=24, seed=3)
    hard.prepare_features(source, ws, MfccConfig(duration_s=1.5,
                                                 min_duration_s=1.0),
                          TextEmbedConfig(), device_batch=12)
    cfg = HardVaeConfig(hidden_dim=32, latent_dim=4, epochs=2, batch_size=12,
                        use_cvae=True, cond_genre=True)
    out = hard.train_hard(ws, cfg, tag="cvae_t")
    assert (Path(ws.root) / "models/hard/cvae_multimodal.pt").exists()
    assert (Path(ws.root) / "models/hard/cvae_multimodal_cvae_t.pt").exists()
    assert out["latents"].shape == (24, 4)
