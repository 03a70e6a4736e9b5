"""Quality-goldens gate (core/goldens.py + QUALITY_GOLDENS.json).

Round-5 verdict item 1: the certified full-scale quality columns need a
mechanical tripwire.  These tests pin the gate's semantics — in particular
that a DOCTORED metric is detected (drift) and that strict mode fails hard.
"""
import json
import subprocess
import sys
from pathlib import Path

import pytest

from vae_hmc_tpu.core import goldens

REPO = Path(__file__).resolve().parents[1]


def test_committed_goldens_parse_and_cover_bench():
    g = goldens.load_goldens()
    assert "bench:tpu:2924:parity" in g
    head = g["bench:tpu:2924:parity"]["headline"]
    for col in ("train_final_loss", "silhouette", "davies_bouldin",
                "ari_vs_genre"):
        assert isinstance(head[col], float)


def test_check_ok_drift_and_no_golden():
    g = {"bench:tpu:2924:parity":
         {"headline": {"silhouette": 0.44593, "ari_vs_genre": 0.31527}}}
    obs = {"headline": {"silhouette": 0.44593, "ari_vs_genre": 0.31527}}
    assert goldens.check("bench:tpu:2924:parity", obs, g)["status"] == "ok"
    # doctored metric -> drift, with the exact cell named
    bad = {"headline": {"silhouette": 0.44594, "ari_vs_genre": 0.31527}}
    res = goldens.check("bench:tpu:2924:parity", bad, g)
    assert res["status"] == "drift"
    assert any("headline.silhouette" in m for m in res["mismatches"])
    # unknown key -> no-golden (CPU runs / shrunken N must not false-alarm)
    assert goldens.check("bench:cpu:64:parity", obs, g)["status"] == \
        "no-golden"


def test_doctored_committed_golden_is_caught():
    """The CI contract from the verdict: a doctored metric fails."""
    g = goldens.load_goldens()
    entry = json.loads(json.dumps(g["bench:tpu:2924:parity"]))
    doctored = {"headline": dict(entry["headline"])}
    doctored["headline"]["silhouette"] += 1e-5
    res = goldens.check("bench:tpu:2924:parity", doctored, g)
    assert res["status"] == "drift"


def test_missing_and_extra_rows_are_drift():
    g = {"k": {"row_a": {"m": 1.0}}}
    res = goldens.check("k", {}, g)
    assert res["status"] == "drift" and "row missing" in res["mismatches"][0]
    res = goldens.check("k", {"row_a": {"m": 1.0}, "row_b": {"m": 2.0}}, g)
    assert res["status"] == "drift" and "new row" in res["mismatches"][0]


def test_nan_equality_and_rtol():
    nan = float("nan")
    g = {"k": {"r": {"m": nan}}}
    assert goldens.check("k", {"r": {"m": nan}}, g)["status"] == "ok"
    assert goldens.check("k", {"r": {"m": 0.5}}, g)["status"] == "drift"
    g2 = {"k": {"_rtol": 1e-6, "r": {"m": 1.0}}}
    assert goldens.check("k", {"r": {"m": 1.0 + 1e-7}}, g2)["status"] == "ok"
    assert goldens.check("k", {"r": {"m": 1.0 + 1e-5}}, g2)["status"] == \
        "drift"


def test_strict_mode_raises(monkeypatch):
    monkeypatch.setenv("VAE_HMC_QUALITY_STRICT", "1")
    g = {"k": {"r": {"m": 1.0}}}
    with pytest.raises(RuntimeError, match="quality drift"):
        goldens.check("k", {"r": {"m": 2.0}}, g)


def test_extract_medium_and_easy(tmp_path):
    res = tmp_path / "results"
    (res / "compare_metrics").mkdir(parents=True)
    (res / "compare_metrics" / "metrics.csv").write_text(
        "method,input,input_dim,k,silhouette,calinski_harabasz,"
        "pca_variance\n"
        "vae_kmeans,mfcc_features,25,6,0.25,100.5,\n"
        "pca_kmeans,vae_latents,8,6,0.24,99.0,0.9991\n")
    easy = goldens.extract_easy(res)
    assert easy["vae_kmeans|mfcc_features"]["silhouette"] == 0.25
    assert easy["pca_kmeans|vae_latents"]["pca_variance"] == 0.9991
    assert easy["vae_kmeans|mfcc_features"]["pca_variance"] is None

    (res / "medium_clustering_metrics_all.csv").write_text(
        "representation,algo,params,n_clusters_found,n_noise,silhouette,"
        "davies_bouldin,ari\n"
        "vae_mm_latents,kmeans,k=6,6,0,0.44593,0.76893,0.31527\n")
    med = goldens.extract_medium(res)
    row = med["vae_mm_latents|kmeans|k=6"]
    assert row["silhouette"] == 0.44593 and row["n_noise"] == 0.0


def test_extract_hard(tmp_path):
    res = tmp_path / "results"
    (res / "hard").mkdir(parents=True)
    (res / "hard" / "hard_metrics_vae_latents.json").write_text(json.dumps(
        {"k": 6, "silhouette": 0.3358, "nmi": 0.5897, "ari": 0.4953,
         "purity": 0.5964}))
    (res / "hard" / "baseline_comparison.csv").write_text(
        "method,silhouette,nmi,ari,purity\n"
        "vae_latents,0.3358,0.5897,0.4953,0.5964\n"
        "raw_features,0.10,0.30,0.20,0.40\n")
    hard = goldens.extract_hard(res)
    assert hard["vae_latents"]["silhouette"] == 0.3358
    assert hard["baseline|raw_features"]["ari"] == 0.20


def test_update_goldens_tool_bench_roundtrip(tmp_path, monkeypatch):
    gp = tmp_path / "QUALITY_GOLDENS.json"
    gp.write_text("{}")
    bench_line = json.dumps({
        "n_tracks": 2924, "mode": "parity (f32 train)",
        "train_final_loss": 0.4, "silhouette": 0.44, "davies_bouldin": 0.76,
        "ari_vs_genre": 0.31})
    env = {"VAE_HMC_GOLDENS_PATH": str(gp), "PATH": "/usr/bin:/bin",
           "HOME": str(tmp_path), "JAX_PLATFORMS": "cpu",
           "JAX_PLATFORM_NAME": "cpu"}
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "update_goldens.py"),
         "--bench", "-"],
        input=bench_line, text=True, capture_output=True, env=env,
        timeout=300)
    assert proc.returncode == 0, proc.stderr
    data = json.loads(gp.read_text())
    key = "bench:cpu:2924:parity"
    assert data[key]["headline"]["silhouette"] == 0.44
    # and the gate accepts exactly what the tool recorded
    monkeypatch.setenv("VAE_HMC_GOLDENS_PATH", str(gp))
    obs = goldens.extract_bench(json.loads(bench_line))
    assert goldens.check(key, obs)["status"] == "ok"


def test_check_tier_no_artifacts(tmp_path, capsys):
    res = goldens.check_tier("medium", tmp_path, 2924)
    assert res["status"] == "no-artifacts"
    assert "no-artifacts" in capsys.readouterr().out
