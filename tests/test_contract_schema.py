"""Artifact-contract regression against the reference's committed goldens.

The reference repo ships its results/ tree; these tests pin our writers'
schemas (CSV headers, JSON keys) to those exact files, so a contract drift
is caught even though the numeric values require the real FMA audio corpus
(SURVEY.md §4: "the results/ tree is effectively a regression fixture set").
Skipped wholesale when the reference checkout is not present.
"""
import csv
import json
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference checkout not mounted")


def _header(path):
    with open(path, newline="", encoding="utf-8") as f:
        return next(csv.reader(f))


def test_medium_suite_csv_header_matches_golden():
    golden = _header(REF / "results/medium_clustering_metrics_all.csv")
    from vae_hmc_tpu.pipelines.medium import _HDR13
    assert _HDR13 == golden


def test_medium_sweep_csv_header_matches_golden():
    golden = _header(REF / "results/medium_full_sweep_metrics.csv")
    from vae_hmc_tpu.pipelines.medium import _HDR16
    assert _HDR16 == golden


def test_compare_metrics_csv_header_matches_golden():
    golden = _header(REF / "results/compare_metrics/metrics.csv")
    assert golden == ["method", "input", "input_dim", "k", "silhouette",
                      "calinski_harabasz", "pca_variance"]


def test_train_log_header_matches_golden():
    golden = _header(REF / "results/vae_conv_mm_medium/train_log.csv")
    assert golden == ["epoch", "loss", "recon", "kl"]


def test_baseline_comparison_header_matches_golden():
    golden = _header(REF / "results/hard/baseline_comparison.csv")
    assert golden == ["method", "silhouette", "nmi", "ari", "purity"]


def test_kmeans_summary_keys_match_golden():
    golden = json.loads(
        (REF / "results/kmeans_vae/kmeans_vae_summary.json").read_text())
    assert set(golden) == {"config", "vae_latent_shape", "label_distribution",
                           "note"}
    assert set(golden["config"]) >= {"k", "seed", "n_init"}


def test_history_json_keys_match_golden():
    golden = json.loads((REF / "results/vae_basic/history.json").read_text())
    assert set(golden) >= {"epoch", "recon", "kl", "total"}
    assert len(golden["epoch"]) == 40          # canonical 40-epoch run


def test_hard_metrics_keys_match_golden():
    golden = json.loads(
        (REF / "results/hard/hard_metrics_vae_latents.json").read_text())
    assert set(golden) == {"feature_space", "k", "silhouette", "nmi", "ari",
                           "purity"}


def test_mel_build_report_header_matches_golden():
    golden = _header(REF / "results/audio_cnn_mel_build_report.csv")
    assert golden == ["track_id", "audio_path", "status", "reason"]


def test_golden_mel_report_row_count_documents_dataset():
    """2,924 ok rows — the dataset scale every preset assumes."""
    with open(REF / "results/audio_cnn_mel_build_report.csv") as f:
        rows = list(csv.DictReader(f))
    assert sum(1 for r in rows if r["status"] == "ok") == 2924


def test_sweep_golden_row_count_matches_grid():
    """The committed sweep has 102 cells: 3 reps x (5 ks x 2 algos + 8 eps x
    3 min_samples) = 3 x 34 (reference scripts/16:159-244) — the same grid
    our SweepConfig defaults produce."""
    from vae_hmc_tpu.core.config import SweepConfig
    cfg = SweepConfig()
    cells_per_rep = (len(cfg.ks) * 2
                     + len(cfg.dbscan_eps) * len(cfg.dbscan_min_samples))
    expected = len(cfg.representations) * cells_per_rep
    with open(REF / "results/medium_full_sweep_metrics.csv") as f:
        golden_rows = sum(1 for _ in f) - 1
    assert golden_rows == expected == 102
