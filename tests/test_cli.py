"""CLI smoke tests on synthetic data (tiny settings)."""
import json
from pathlib import Path

import pytest

from vae_hmc_tpu import cli


def test_cli_help_lists_all_commands(capsys):
    with pytest.raises(SystemExit):
        cli.main(["--help"])
    out = capsys.readouterr().out
    for cmd in ("download-fma", "build-manifest", "fetch-lyrics",
                "fetch-transcriptions", "combine-manifest", "clean-manifest",
                "train-basic-vae", "cluster-easy", "viz-easy", "compare-pca",
                "build-mel", "build-lyrics-emb", "train-conv-mm",
                "cluster-medium", "viz-cluster", "viz-side-by-side",
                "sweep-medium", "report-medium", "prepare-hard", "train-hard",
                "cluster-hard", "viz-hard", "compare-hard", "bench"):
        assert cmd in out, f"missing CLI command {cmd}"


def test_cli_easy_flow(tmp_path, capsys):
    root = str(tmp_path)
    rc = cli.main(["train-basic-vae", "--root", root, "--synthetic", "30",
                   "--duration", "1.5", "--epochs", "2", "--batch-size", "10",
                   "--latent-dim", "4", "--device-batch", "15"])
    assert rc == 0
    assert (tmp_path / "results/vae_basic/latent_mu.npy").exists()
    rc = cli.main(["cluster-easy", "--root", root, "--k", "3",
                   "--n-init", "3"])
    assert rc == 0
    dist = json.loads(capsys.readouterr().out.strip().split("\n")[-1])
    assert sum(dist.values()) == 30
    rc = cli.main(["compare-pca", "--root", root, "--k", "3", "--n-init", "3"])
    assert rc == 0
    assert (tmp_path / "results/compare_metrics/metrics.csv").exists()


def test_cli_hard_flow(tmp_path):
    root = str(tmp_path)
    rc = cli.main(["prepare-hard", "--root", root, "--synthetic", "24",
                   "--duration", "1.5", "--device-batch", "12"])
    assert rc == 0
    rc = cli.main(["train-hard", "--root", root, "--epochs", "2",
                   "--batch-size", "12", "--latent-dim", "4",
                   "--hidden-dim", "32"])
    assert rc == 0
    rc = cli.main(["cluster-hard", "--root", root])
    assert rc == 0
    assert (tmp_path / "results/hard/hard_metrics_vae_latents.json").exists()
