"""Easy tier: MFCC-stats -> dense VAE -> KMeans -> PCA baseline comparison.

Reproduces the artifact contract of reference scripts 06/07/08/09:

  results/vae_basic/   vae_basic.pt (npz payload), scaler.joblib,
                       track_ids.npy, latent_mu.npy, train_config.json,
                       history.json, mfcc_features_cache.npy
  results/kmeans_vae/  labels_vae_kmeans.npy, kmeans_vae_centers.npy,
                       track_ids.npy, kmeans_vae_summary.json
  results/compare_metrics/  metrics.csv, metrics_report.json,
                       labels_pca_mfcc.npy, labels_pca_latents.npy,
                       plots/pca_variance_{mfcc,latents}.png
  results/viz_vae/plots/vae_{umap|tsne}.png   (script 08)

Same knobs, same defaults, same numerics conventions — but the compute is
the TPU stack: fused MFCC kernel, one-program VAE training, vmapped-restart
KMeans, on-device metrics.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import joblib
import numpy as np

from vae_hmc_tpu.core import artifacts
from vae_hmc_tpu.core.config import (DenseVaeConfig, KMeansConfig, MfccConfig,
                                     TsneConfig, UmapConfig, Workspace, asdict)
from vae_hmc_tpu.cluster.kmeans import kmeans
from vae_hmc_tpu.metrics import internal as im
from vae_hmc_tpu.models import api as model_api
from vae_hmc_tpu.ops.pca import PCA
from vae_hmc_tpu.ops.scaler import StandardScaler
from vae_hmc_tpu.pipelines import features
from vae_hmc_tpu.pipelines.sources import Source
from vae_hmc_tpu.viz import plots


def _safe_metrics(x, labels) -> Dict[str, float]:
    """silhouette + CH with nan fallback (reference 09:49-60)."""
    out = {}
    try:
        out["silhouette"] = float(im.silhouette(x, labels))
    except Exception:
        out["silhouette"] = float("nan")
    try:
        out["calinski_harabasz"] = float(im.calinski_harabasz(x, labels))
    except Exception:
        out["calinski_harabasz"] = float("nan")
    return out


def train_basic_vae(source: Source, ws: Workspace,
                    mfcc_cfg: MfccConfig = MfccConfig(),
                    vae_cfg: DenseVaeConfig = DenseVaeConfig(),
                    device_batch: int = 64,
                    verbose: bool = False,
                    use_cache: bool = True) -> Dict:
    """Script 06 equivalent. Returns {"latents", "track_ids", "history", ...}."""
    out_dir = ws.results / "vae_basic"
    out_dir.mkdir(parents=True, exist_ok=True)

    # cache blob contract (06:119-139: dict {X, track_ids}, reused on rerun)
    cache_path = out_dir / "mfcc_features_cache.npy"
    report = None
    # Speculative AOT train setup overlapped with the feature scan (round 5,
    # same shape-only mechanism as the medium tier — pipelines.medium):
    # planned from the source row count and the 2*n_mfcc stats width; a
    # dropped row or width drift just means the speculation lost and the
    # plain path trains (tolerant consume below).
    import threading
    _d = 2 * mfcc_cfg.n_mfcc
    _pcfg = DenseVaeConfig(**{**asdict(vae_cfg), "input_dim": _d,
                              "hidden_dims": tuple(vae_cfg.hidden_dims)})
    _prep_box: Dict = {}

    def _prepare_train():
        try:
            _prep_box["prep"] = model_api.prepare_dense_vae(
                len(source), _d, _pcfg)
        except Exception as e:
            _prep_box["err"] = e

    _prep_thread = threading.Thread(target=_prepare_train, daemon=True)
    _prep_thread.start()
    if use_cache and cache_path.exists():
        blob = np.load(cache_path, allow_pickle=True).item()
        x, ids = blob["X"], blob["track_ids"]
    else:
        x, ids, report = features.build_mfcc_stats(source, mfcc_cfg,
                                                   device_batch=device_batch)
        np.save(cache_path, {"X": x, "track_ids": ids}, allow_pickle=True)

    scaler = StandardScaler().fit(x)
    joblib.dump(scaler, out_dir / "scaler.joblib")
    xs = np.asarray(scaler.transform(x))

    cfg = DenseVaeConfig(**{**asdict(vae_cfg), "input_dim": x.shape[1],
                            "hidden_dims": tuple(vae_cfg.hidden_dims)})
    _prep_thread.join()
    prepared = _prep_box.get("prep")
    if prepared is not None and (prepared.cfg != cfg
                                 or prepared.shapes != (tuple(xs.shape),)):
        prepared = None               # speculation lost (rows dropped, ...)
    model, res, mu = model_api.train_dense_vae(xs, cfg, verbose=verbose,
                                               prepared=prepared)

    np.save(out_dir / "track_ids.npy", ids)
    np.save(out_dir / "latent_mu.npy", mu.astype(np.float32))
    artifacts.save_checkpoint(out_dir / "vae_basic.pt", res.params,
                              metadata={"config": asdict(cfg)})
    # train_config.json uses the reference's key names (06:348-349 contract,
    # cf. the committed results/vae_basic/train_config.json)
    train_config = {
        "out_dir": str(out_dir),
        "sample_rate": mfcc_cfg.sample_rate,
        "duration_sec": mfcc_cfg.duration_s,
        "n_mfcc": mfcc_cfg.n_mfcc,
        "hop_length": mfcc_cfg.hop_length,
        "n_fft": mfcc_cfg.n_fft,
        "batch_size": cfg.batch_size,
        "epochs": cfg.epochs,
        "lr": cfg.learning_rate,
        "latent_dim": cfg.latent_dim,
        "hidden_dim": cfg.hidden_dims[0],
        "beta": cfg.beta,
        "seed": cfg.seed,
        "cache_features": use_cache,
    }
    (out_dir / "train_config.json").write_text(json.dumps(train_config, indent=2))
    hist_cols = {k: [h[k] for h in res.history]
                 for k in ("epoch", "total", "recon", "kl")}
    (out_dir / "history.json").write_text(json.dumps(hist_cols, indent=2))
    return {"latents": mu, "track_ids": ids, "history": res.history,
            "features": x, "out_dir": out_dir, "report": report}


def cluster_easy(ws: Workspace, km_cfg: KMeansConfig = KMeansConfig(),
                 latents: Optional[np.ndarray] = None,
                 track_ids: Optional[np.ndarray] = None) -> Dict:
    """Script 07 equivalent: standardize latents, KMeans, save labels/summary."""
    vae_out = ws.results / "vae_basic"
    out_dir = ws.results / "kmeans_vae"
    out_dir.mkdir(parents=True, exist_ok=True)
    if latents is None:
        latents, track_ids = artifacts.load_features(
            vae_out / "latent_mu.npy", vae_out / "track_ids.npy")

    zs = (np.asarray(StandardScaler().fit_transform(latents))
          if km_cfg.standardize else np.asarray(latents, np.float32))
    res = kmeans(zs, km_cfg)

    np.save(out_dir / "labels_vae_kmeans.npy", res.labels.astype(np.int64))
    np.save(out_dir / "kmeans_vae_centers.npy", res.centers.astype(np.float32))
    np.save(out_dir / "track_ids.npy", track_ids)
    uniq, counts = np.unique(res.labels, return_counts=True)
    summary = {
        "config": {"vae_out_dir": str(vae_out), "out_dir": str(out_dir),
                   "k": km_cfg.n_clusters, "seed": km_cfg.seed,
                   "n_init": km_cfg.n_init},
        "vae_latent_shape": list(np.asarray(latents).shape),
        "label_distribution": {int(u): int(c) for u, c in zip(uniq, counts)},
        "note": "Labels correspond to rows in track_ids.npy.",
    }
    (out_dir / "kmeans_vae_summary.json").write_text(json.dumps(summary, indent=2))
    return {"labels": res.labels, "centers": res.centers, "summary": summary,
            "scaled_latents": zs}


def visualize_easy(ws: Workspace, method: str = "umap",
                   tsne_cfg: TsneConfig = TsneConfig(),
                   umap_cfg: UmapConfig = UmapConfig()) -> Dict:
    """Script 08 equivalent: 2-D projection of standardized latents colored by
    KMeans label.  UMAP is an optional host dependency; absent -> t-SNE
    (the reference's optional-import fallback, 08:14-18)."""
    from vae_hmc_tpu.viz.projections import reduce_2d

    vae_out = ws.results / "vae_basic"
    km_out = ws.results / "kmeans_vae"
    out_dir = ws.results / "viz_vae" / "plots"
    latents, _ = artifacts.load_features(
        vae_out / "latent_mu.npy", vae_out / "track_ids.npy")
    labels = np.load(km_out / "labels_vae_kmeans.npy")
    zs = np.asarray(StandardScaler().fit_transform(latents))
    xy, used = reduce_2d(zs, method, tsne_cfg=tsne_cfg, umap_cfg=umap_cfg)
    path = plots.scatter_2d(xy, labels, out_dir / f"vae_{used}.png",
                            f"VAE latents ({used}) colored by KMeans cluster")
    return {"plot": path, "method": used, "xy": xy}


def compare_pca_baseline(ws: Workspace,
                         km_cfg: KMeansConfig = KMeansConfig()) -> Dict:
    """Script 09 equivalent: VAE+KMeans vs PCA+KMeans on raw MFCC and on VAE
    latents; metrics.csv + metrics_report.json + labels + variance plots."""
    vae_out = ws.results / "vae_basic"
    km_out = ws.results / "kmeans_vae"
    out_dir = ws.results / "compare_metrics"
    plots_dir = out_dir / "plots"
    out_dir.mkdir(parents=True, exist_ok=True)

    z = np.load(vae_out / "latent_mu.npy").astype(np.float32)
    labels_vae = np.load(km_out / "labels_vae_kmeans.npy").astype(np.int64)
    zs = np.asarray(StandardScaler().fit_transform(z))
    vae_metrics = _safe_metrics(zs, labels_vae)
    latent_dim = z.shape[1]

    def run_pca_kmeans(x):
        xsc = np.asarray(StandardScaler().fit_transform(x))
        p = PCA(min(latent_dim, xsc.shape[1], xsc.shape[0])).fit(xsc)
        xp = np.asarray(p.transform(xsc))
        labels = kmeans(xp, km_cfg).labels
        return labels, xp, p

    rows = [{
        "method": "VAE+KMeans", "input": "VAE latents",
        "input_dim": latent_dim, "k": km_cfg.n_clusters,
        "silhouette": vae_metrics["silhouette"],
        "calinski_harabasz": vae_metrics["calinski_harabasz"],
        "pca_variance": "",
    }]
    report: Dict = {"vae_metrics": vae_metrics}

    cache = vae_out / "mfcc_features_cache.npy"
    if cache.exists():
        blob = np.load(cache, allow_pickle=True).item()
        x_mfcc = blob["X"]
        labels_pm, xp, p = run_pca_kmeans(x_mfcc)
        np.save(out_dir / "labels_pca_mfcc.npy", labels_pm)
        mets = _safe_metrics(xp, labels_pm)
        ev = float(np.sum(p.explained_variance_ratio_))
        plots.pca_variance_plot(
            p.explained_variance_ratio_, plots_dir / "pca_variance_mfcc.png",
            f"PCA Explained Variance Ratio (MFCC features -> {latent_dim}D)")
        rows.append({
            "method": f"PCA({latent_dim})+KMeans",
            "input": f"MFCC features ({x_mfcc.shape[1]}D)",
            "input_dim": latent_dim, "k": km_cfg.n_clusters,
            "silhouette": mets["silhouette"],
            "calinski_harabasz": mets["calinski_harabasz"],
            "pca_variance": ev,
        })
        report["pca_mfcc"] = {**mets, "explained_variance": ev}

    labels_pl, xp, p = run_pca_kmeans(z)
    np.save(out_dir / "labels_pca_latents.npy", labels_pl)
    mets = _safe_metrics(xp, labels_pl)
    ev = float(np.sum(p.explained_variance_ratio_))
    plots.pca_variance_plot(
        p.explained_variance_ratio_, plots_dir / "pca_variance_latents.png",
        f"PCA Explained Variance Ratio (VAE latents -> {latent_dim}D)")
    rows.append({
        "method": f"PCA({latent_dim})+KMeans",
        "input": f"VAE latents ({latent_dim}D)",
        "input_dim": latent_dim, "k": km_cfg.n_clusters,
        "silhouette": mets["silhouette"],
        "calinski_harabasz": mets["calinski_harabasz"],
        "pca_variance": ev,
    })
    report["pca_latents"] = {**mets, "explained_variance": ev}

    header = ["method", "input", "input_dim", "k", "silhouette",
              "calinski_harabasz", "pca_variance"]
    artifacts.save_csv_rows(out_dir / "metrics.csv", header,
                            [[r[h] for h in header] for r in rows])
    report["files"] = {"metrics_csv": str(out_dir / "metrics.csv")}
    (out_dir / "metrics_report.json").write_text(
        json.dumps(report, indent=2, default=float))
    _print_pca_interpretation(rows, report, latent_dim)
    return {"rows": rows, "report": report}


def _print_pca_interpretation(rows, report: Dict, latent_dim: int) -> None:
    """Reference script 09's stdout interpretation narrative (09:308-442):
    comparison tables, VAE-vs-PCA verdict bullets, and the key findings
    block.  stdout-only behavior parity — no file contract."""
    def table(rs):
        widths = {h: max(len(h), *(len(str(r[h])) for r in rs))
                  for h in rs[0]}
        print("  ".join(h.ljust(widths[h]) for h in rs[0]))
        for r in rs:
            print("  ".join(str(r[h]).ljust(widths[h]) for h in r))

    def verdict(vae_sil, pca_sil, subject: str):
        if vae_sil is None or pca_sil is None:
            return
        if vae_sil > pca_sil and pca_sil:
            diff = (vae_sil - pca_sil) / abs(pca_sil) * 100
            print(f"  • VAE outperforms PCA by {diff:+.1f}% on Silhouette "
                  "Score")
            print("  • VAE's non-linear compression is better for clustering")
        elif pca_sil > vae_sil and vae_sil:
            diff = (pca_sil - vae_sil) / abs(vae_sil) * 100
            print(f"  • PCA outperforms VAE by {diff:+.1f}% on Silhouette "
                  "Score")
            print("  • Linear PCA is sufficient for this data")
        else:
            print("  • VAE and PCA perform similarly")

    vae_sil = report["vae_metrics"].get("silhouette")
    print("\nCOMPARISON RESULTS (VAE vs PCA on MFCC features):")
    print("-" * 60)
    if "pca_mfcc" in report:
        table(rows[:2])
        print("\nInterpretation (MFCC comparison):")
        verdict(vae_sil, report["pca_mfcc"].get("silhouette"), "MFCC")
        print(f"  • PCA captures {report['pca_mfcc']['explained_variance']:.1%}"
              " of MFCC variance")
    else:
        print("  MFCC comparison not available (run with --cache_features)")

    print("\n" + "=" * 60)
    print("COMPARISON RESULTS (VAE vs PCA on VAE latents):")
    print("-" * 60)
    table([rows[0], rows[-1]])
    print("\nInterpretation (VAE latents comparison):")
    pl = report["pca_latents"]
    if vae_sil is not None and pl.get("silhouette") is not None:
        identical = abs(vae_sil - pl["silhouette"]) < 1e-4
        print(f"  • Scores are {'identical' if identical else 'similar'}")
        print(f"  • PCA captures {pl['explained_variance']:.1%} of VAE "
              "latent variance")
        if pl["explained_variance"] > 0.99:
            print(f"  • PCA({latent_dim}) on {latent_dim}D data "
                  "≈ identity transformation")

    print("\n" + "=" * 60)
    print("KEY FINDINGS:")
    print("=" * 60)
    if "pca_mfcc" in report:
        verdict(vae_sil, report["pca_mfcc"].get("silhouette"), "MFCC")
    print("✓ Original identical results explained: PCA on VAE latents is "
          "redundant")
    print(f"  → PCA captures {pl['explained_variance']:.1%} of VAE latent "
          "variance")


def run_easy_pipeline(source: Source, ws: Workspace,
                      mfcc_cfg: MfccConfig = MfccConfig(),
                      vae_cfg: DenseVaeConfig = DenseVaeConfig(),
                      km_cfg: KMeansConfig = KMeansConfig(),
                      with_viz: bool = True,
                      device_batch: int = 64,
                      verbose: bool = False) -> Dict:
    """Full easy tier (06 -> 07 -> 08 -> 09) in one call.  Writes a
    per-stage wall-clock report to results/timing_easy.json."""
    from vae_hmc_tpu.core.profiling import StageTimer, warm_connection
    timer = StageTimer()
    warm_connection(timer)
    n = len(source)
    with timer.stage("train_basic_vae", n):
        t = train_basic_vae(source, ws, mfcc_cfg, vae_cfg,
                            device_batch=device_batch, verbose=verbose)
    with timer.stage("cluster_easy", n):
        c = cluster_easy(ws, km_cfg, latents=t["latents"],
                         track_ids=t["track_ids"])
    v = None
    if with_viz:
        with timer.stage("visualize_easy", n):
            v = visualize_easy(ws)
    with timer.stage("compare_pca_baseline", n):
        m = compare_pca_baseline(ws, km_cfg)
    timer.save(ws.results / "timing_easy.json")
    from vae_hmc_tpu.core import goldens
    q = goldens.check_tier("easy", ws.results, n)
    return {"train": t, "cluster": c, "viz": v, "compare": m,
            "timing": timer.report(), "quality_drift": q}
