"""Medium tier: log-mel + lyrics embeddings -> conv multimodal VAE ->
clustering suites, sweeps, reports and visualizations.

Reproduces the artifact contract of reference scripts 10-17:

  data/audio_cnn_mel_X.npy (N,1,128,T) + audio_cnn_mel_track_ids.npy
  results/audio_cnn_mel_build_report.csv                      (script 10)
  data/lyrics_embeddings.npy (M,D) + lyrics_track_ids.npy
  results/lyrics_embedding_report.csv                         (script 11)
  results/vae_conv_mm_medium/{train_log.csv, ckpt_epoch_NNN.pt}
  data/vae_mm_latents_mu.npy + vae_mm_latents_track_ids.npy   (script 12)
  results/medium_clustering_metrics_all.csv                   (script 13)
  results/cluster_viz/<tag>_<repr>_<method>_<proj>_{clusters,truegenre}.png
                      + _summary.txt                          (script 14)
  results/cluster_viz/side_by_side_medium.png
    + lyrics_dbscan_eps_sweep_{clusters,noise}_medium.png     (script 15)
  results/medium_full_sweep_metrics.csv + best tables         (script 16)
  results/report_medium/best_filtered*.csv + plots            (script 17)
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from vae_hmc_tpu.core import artifacts
from vae_hmc_tpu.core.align import align_secondary_to_primary, labels_for_ids
from vae_hmc_tpu.core.config import (ConvMMVaeConfig, MelConfig, SweepConfig,
                                     TextEmbedConfig, Workspace, asdict)
from vae_hmc_tpu.cluster import sweep as sweep_mod
from vae_hmc_tpu.cluster.sweep import RepData
from vae_hmc_tpu.models import api as model_api
from vae_hmc_tpu.models.conv_mm_vae import to_nhwc
from vae_hmc_tpu.ops.scaler import StandardScaler
from vae_hmc_tpu.pipelines import features
from vae_hmc_tpu.pipelines.sources import Source
from vae_hmc_tpu.viz import plots


# ---------------------------------------------------------------------------
# Script 10: log-mel features
# ---------------------------------------------------------------------------


def build_audio_features(source: Source, ws: Workspace,
                         cfg: MelConfig = MelConfig(),
                         device_batch: int = 32,
                         write_features: bool = True,
                         hbm_resident: bool = False) -> Dict:
    """write_features=False keeps the (N,1,128,T) tensor in memory only —
    for bandwidth-constrained dev hosts where fetching ~1 GB to write
    audio_cnn_mel_X.npy dominates; the id/report contract is still written.
    Default True preserves the full reference file contract.

    hbm_resident=True: the returned "x" is a DEVICE (N, mels, T) array that
    never round-trips to host (unless write_features forces one fetch for
    the .npy); training and the sweep consume it in place."""
    x, ids, report = features.build_logmel(source, cfg, device_batch,
                                           hbm_resident=hbm_resident)
    ws.data.mkdir(parents=True, exist_ok=True)
    if write_features:
        x_file = (np.asarray(x)[:, None, :, :] if hbm_resident
                  else x)                          # (N, 1, mels, T) contract
        np.save(ws.data / "audio_cnn_mel_X.npy", x_file)
    np.save(ws.data / "audio_cnn_mel_track_ids.npy", ids)
    report.save(ws.results / "audio_cnn_mel_build_report.csv")
    return {"x": x, "ids": ids, "report": report}


# ---------------------------------------------------------------------------
# Script 11: lyrics embeddings
# ---------------------------------------------------------------------------


def build_lyrics_embeddings(source: Source, ws: Workspace,
                            cfg: TextEmbedConfig = TextEmbedConfig()) -> Dict:
    """Embeds rows with >= cfg.min_chars of text (reference scripts/11:43);
    skipped rows recorded in the report CSV (11:58-76)."""
    from vae_hmc_tpu.text.embed import embed_texts

    texts, ids, rows = [], [], []
    for i in range(len(source)):
        tid = int(source.track_ids[i])
        t = source.lyrics_text(i) or ""
        n_chars = len(t.strip())
        if n_chars < cfg.min_chars:
            rows.append((tid, "skipped", "too_short", n_chars))
            continue
        texts.append(t)
        ids.append(tid)
        rows.append((tid, "ok", "", n_chars))
    if not texts:
        raise RuntimeError("no rows had usable text")
    # medium tier wants a fixed-width dense embedding (the conv VAE's lyrics
    # branch); minilm when weights exist, else hashed 384-d
    emb, backend = embed_texts(texts, cfg, allow_tfidf=False)
    ws.data.mkdir(parents=True, exist_ok=True)
    np.save(ws.data / "lyrics_embeddings.npy", emb.astype(np.float32))
    np.save(ws.data / "lyrics_track_ids.npy", np.asarray(ids, dtype=np.int64))
    artifacts.save_csv_rows(ws.results / "lyrics_embedding_report.csv",
                            ["track_id", "status", "reason", "n_chars"], rows)
    return {"emb": emb, "ids": np.asarray(ids), "backend": backend}


# ---------------------------------------------------------------------------
# Script 12: conv multimodal VAE
# ---------------------------------------------------------------------------


def train_conv_mm(ws: Workspace, cfg: ConvMMVaeConfig = ConvMMVaeConfig(),
                  save_epoch_checkpoints: bool = True,
                  verbose: bool = False,
                  audio: Optional[Dict] = None,
                  lyrics: Optional[Dict] = None, mesh=None,
                  defer_artifacts: bool = False,
                  artifact_gate=None, prepared=None) -> Dict:
    """audio/lyrics: optionally pass build_audio_features /
    build_lyrics_embeddings results to skip re-reading from disk.

    defer_artifacts=True writes the checkpoint/CSV/latent files on a
    background thread (returned as out['artifact_thread']; the pipeline
    joins it before returning) so the 342 MB checkpoint-param device fetch
    overlaps the downstream cluster stages instead of blocking them.

    artifact_gate: optional threading.Event the background thread waits on
    before its device fetch.  The tunnel is single-stream-saturated
    (~30-36 MB/s aggregate regardless of concurrency — measured round 5,
    tools/profile_fetch.py), so an ungated checkpoint fetch steals exactly
    the bandwidth the RepData distance prefetches AND the dispatch-heavy
    cluster/sweep stages' small readbacks need; the pipeline sets the gate
    after full_clustering_sweep, ordering the tunnel traffic: dists ->
    cluster/sweep round trips -> checkpoint (needed last, at the
    end-of-tier join), which leaves the fetch overlapping the compute-bound
    viz stages (measured: cluster_and_evaluate 17.8 s contended vs 10.4 s
    uncontended, round-5 floor runs)."""
    if audio is not None:
        x, a_ids = audio["x"], audio["ids"]
    else:
        x, a_ids = artifacts.load_features(
            ws.data / "audio_cnn_mel_X.npy",
            ws.data / "audio_cnn_mel_track_ids.npy")
    if lyrics is not None:
        lyr_raw, l_ids = lyrics["emb"], lyrics["ids"]
    else:
        lyr_raw, l_ids = artifacts.load_features(
            ws.data / "lyrics_embeddings.npy",
            ws.data / "lyrics_track_ids.npy")
    lyr, mask = align_secondary_to_primary(a_ids, l_ids, lyr_raw)

    out_dir = ws.results / "vae_conv_mm_medium"
    out_dir.mkdir(parents=True, exist_ok=True)

    from vae_hmc_tpu.core.profiling import log as _vlog
    import time as _time
    _t0 = _time.perf_counter()
    x_nhwc = to_nhwc(x)          # device arrays relayout on device
    if prepared is not None:
        # TOLERANT consume (vs model_api's strict raise): the pipeline's
        # prepare was planned from the SOURCE row count, but the feature
        # build may drop non-finite rows — a shape drift here just means
        # the speculation lost; train the plain path.
        want = (tuple(x_nhwc.shape), (x_nhwc.shape[0], lyr.shape[1]),
                (x_nhwc.shape[0], 1))
        if (mesh is not None or prepared.cfg != cfg
                or tuple(prepared.shapes) != want):
            _vlog(f"train12: dropping stale prepared trainer "
                  f"(prepared {prepared.shapes} vs data {want})")
            prepared = None
    model, res, mu = model_api.train_conv_mm_vae(x_nhwc, lyr, mask, cfg,
                                                 verbose=verbose, mesh=mesh,
                                                 prepared=prepared)
    _vlog(f"train12/fit+export: {_time.perf_counter() - _t0:.1f}s")

    def _save_artifacts():
        _ts = _time.perf_counter()
        # train_log.csv contract: epoch,loss,recon,kl (12:238-241)
        artifacts.save_csv_rows(
            out_dir / "train_log.csv", ["epoch", "loss", "recon", "kl"],
            [[h["epoch"], f"{h['total']:.6f}", f"{h['recon']:.6f}",
              f"{h['kl']:.6f}"] for h in res.history])
        if save_epoch_checkpoints:
            # the reference checkpoints every epoch (12:281-285); we keep
            # the filename contract for the final epoch and add resumable
            # metadata.  The 342 MB param pytree (two 170 MB FC kernels)
            # crosses device->host as one buffer per dtype — per-leaf
            # fetches pay the slow small-stream readback path on tunneled
            # links (core.artifacts.fetch_pytree_single_buffer).
            # chunk_mb=16: this fetch overlaps the cluster/sweep stages —
            # chunking keeps their small readbacks from queueing behind one
            # 342 MB transfer (head-of-line fairness; see _fetch_1d)
            params_host = artifacts.fetch_pytree_single_buffer(
                res.params, chunk_mb=16)
            artifacts.save_checkpoint(
                out_dir / f"ckpt_epoch_{cfg.epochs:03d}.pt", params_host,
                metadata={"config": asdict(cfg), "epoch": cfg.epochs,
                          "input_shape": ([x.shape[0], 1, x.shape[1],
                                           x.shape[2]]
                                          if x.ndim == 3 else list(x.shape))})
        np.save(ws.data / "vae_mm_latents_mu.npy", mu.astype(np.float32))
        np.save(ws.data / "vae_mm_latents_track_ids.npy", a_ids)
        _vlog(f"train12/artifacts (ckpt fetch + saves): "
              f"{_time.perf_counter() - _ts:.1f}s")

    out = {"latents": mu, "ids": a_ids, "history": res.history,
           "params": res.params, "lyrics_mask": mask}
    if defer_artifacts:
        import threading

        class _ArtifactThread(threading.Thread):
            """join_and_raise() propagates a background save failure to the
            pipeline instead of silently reporting success with missing or
            stale artifact files."""
            exc: Optional[BaseException] = None

            def run(self):
                try:
                    if artifact_gate is not None:
                        artifact_gate.wait()
                    _save_artifacts()
                except BaseException as e:
                    self.exc = e

            def join_and_raise(self):
                self.join()
                if self.exc is not None:
                    raise self.exc

        t = _ArtifactThread(daemon=False)
        t.start()
        out["artifact_thread"] = t
    else:
        _save_artifacts()
    return out


# ---------------------------------------------------------------------------
# Representations shared by scripts 13-16
# ---------------------------------------------------------------------------


def _build_rep(name, x, ids, genre_map, standardize,
               pca_dim: int = 0) -> RepData:
    """Accepts host numpy or device arrays; device inputs stay on device
    (standardization/PCA run as device ops, sklearn-equivalent)."""
    import jax
    import jax.numpy as jnp
    on_device = isinstance(x, jax.Array)
    xp = jnp if on_device else np
    x = x if on_device else np.asarray(x)
    x = x.reshape(x.shape[0], -1).astype(xp.float32)
    if standardize:
        if on_device:
            mean = jnp.mean(x, axis=0)
            std = jnp.std(x, axis=0)           # ddof=0, sklearn default
            x = (x - mean) / jnp.where(std == 0.0, 1.0, std)
        else:
            x = np.asarray(StandardScaler().fit_transform(x))
    if pca_dim and x.shape[1] > pca_dim:   # optional reduction (ref 13:172-174)
        from vae_hmc_tpu.ops.pca import PCA
        # explicit clamp for tiny synthetic runs (N < pca_dim); oversize k
        # raises since round 4 (sklearn parity)
        x = PCA(min(pca_dim, int(x.shape[0]))).fit_transform(x)
        if not on_device:                   # host fetch only if the caller
            x = np.asarray(x)               # started on host
    y_true = labels_for_ids(ids, genre_map) if genre_map is not None else None
    return RepData.build(name, x, y_true)


def _load_reps(ws: Workspace, genre_map: Optional[Dict],
               standardize: bool = False,
               names: Sequence[str] = ("vae_mm_latents", "baseline_mel_flat",
                                       "baseline_lyrics_only"),
               arrays: Optional[Dict] = None,
               pca_dim: int = 0) -> List[RepData]:
    """arrays: optional {name: (x, ids)} overriding the on-disk artifacts —
    lets run_medium_pipeline thread stage outputs through memory."""
    paths = {
        "vae_mm_latents": (ws.data / "vae_mm_latents_mu.npy",
                           ws.data / "vae_mm_latents_track_ids.npy"),
        "baseline_mel_flat": (ws.data / "audio_cnn_mel_X.npy",
                              ws.data / "audio_cnn_mel_track_ids.npy"),
        "baseline_lyrics_only": (ws.data / "lyrics_embeddings.npy",
                                 ws.data / "lyrics_track_ids.npy"),
    }
    reps = []
    for name in names:
        if arrays is not None and name in arrays:
            x, ids = arrays[name]
        else:
            xp, ip = paths[name]
            x, ids = artifacts.load_features(xp, ip)
        reps.append(_build_rep(name, x, ids, genre_map, standardize, pca_dim))
    return reps


def _rows_to_csv(rows: List[Dict], path: Path, header: List[str]) -> Path:
    return artifacts.save_csv_rows(
        path, header,
        [["" if r.get(h) is None else r.get(h) for h in header] for r in rows])


_HDR13 = ["representation", "algo", "params", "n_clusters_found", "n_noise",
          "silhouette", "davies_bouldin", "ari"]
_HDR16 = ["representation", "algo", "params", "n_clusters_found", "n_noise",
          "noise_frac", "silhouette", "davies_bouldin", "ari", "score"]


def cluster_and_evaluate(ws: Workspace, genre_map: Optional[Dict] = None,
                         n_clusters: int = 6,
                         standardize: bool = False,
                         arrays: Optional[Dict] = None,
                         pca_dim: int = 0,
                         reps: Optional[List[RepData]] = None) -> List[Dict]:
    """Script 13: fixed-k suite over the 3 representations.

    `reps`: pass prebuilt RepData to share the cached device distance
    matrices and ward linkages with full_clustering_sweep (the pipeline
    builds each representation exactly once)."""
    if reps is None:
        reps = _load_reps(ws, genre_map, standardize, arrays=arrays,
                          pca_dim=pca_dim)
    # queue every rep's kmeans program + ward linkage before the per-rep
    # evaluation loop: the device works through the whole queue while the
    # host computes metrics for rep 0 (see RepData.kmeans_prefetch)
    for rep in reps:
        rep.kmeans_prefetch([n_clusters])
        rep.ward_prefetch()
    rows: List[Dict] = []
    for rep in reps:
        rows += sweep_mod.cluster_suite(rep, n_clusters)
    _rows_to_csv(rows, ws.results / "medium_clustering_metrics_all.csv", _HDR13)
    # the reference prints a top-12 heuristic-score ranking view (13:226-236)
    ranked = sorted(rows, key=sweep_mod.heuristic_score, reverse=True)[:12]
    print("Top results (heuristic score):")
    for r in ranked:
        print(f"  {r['representation']:22s} {r['algo']:14s} "
              f"{r['params']:16s} score={sweep_mod.heuristic_score(r):.4f}")
    return rows


def full_clustering_sweep(ws: Workspace, genre_map: Optional[Dict] = None,
                          cfg: SweepConfig = SweepConfig(),
                          standardize: bool = False,
                          arrays: Optional[Dict] = None,
                          reps: Optional[List[RepData]] = None) -> List[Dict]:
    """Script 16: full grid + best-by-representation + best-overall tables."""
    if reps is None:
        reps = _load_reps(ws, genre_map, standardize, cfg.representations,
                          arrays=arrays)
    for rep in reps:                      # cross-rep device-queue fill
        rep.kmeans_prefetch(cfg.ks, seed=cfg.seed)
        rep.ward_prefetch()
    rows: List[Dict] = []
    for rep in reps:
        rows += sweep_mod.full_sweep(rep, cfg.ks, cfg.dbscan_eps,
                                     cfg.dbscan_min_samples, seed=cfg.seed)
    _rows_to_csv(rows, ws.results / "medium_full_sweep_metrics.csv", _HDR16)
    by_score = sorted(rows, key=lambda r: r["score"], reverse=True)
    best_by_rep, seen = [], set()
    for r in by_score:
        if r["representation"] not in seen:
            seen.add(r["representation"])
            best_by_rep.append(r)
    _rows_to_csv(best_by_rep,
                 ws.results / "medium_full_sweep_best_by_representation.csv",
                 _HDR16)
    _rows_to_csv(by_score[:20],
                 ws.results / "medium_full_sweep_best_overall.csv", _HDR16)
    return rows


# ---------------------------------------------------------------------------
# Script 17: report tables + plots
# ---------------------------------------------------------------------------


def report_tables_and_plots(ws: Workspace, max_noise: float = 0.30,
                            min_clusters: int = 2) -> Dict:
    import csv as _csv

    sweep_csv = ws.results / "medium_full_sweep_metrics.csv"
    out_dir = ws.results / "report_medium"
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(sweep_csv, newline="") as f:
        rows = [dict(r) for r in _csv.DictReader(f)]

    def fnum(v, default=None):
        try:
            return float(v)
        except (TypeError, ValueError):
            return default

    for r in rows:
        for c in ("silhouette", "davies_bouldin", "ari", "noise_frac",
                  "score"):
            r[c] = fnum(r.get(c))
        r["n_clusters_found"] = int(float(r["n_clusters_found"]))

    filt = [r for r in rows if r["n_clusters_found"] >= min_clusters
            and (r["algo"] != "dbscan"
                 or (r["noise_frac"] is not None
                     and r["noise_frac"] <= max_noise))]
    filt.sort(key=lambda r: (r["score"] if r["score"] is not None else -1e9),
              reverse=True)
    _rows_to_csv(filt, out_dir / "best_filtered.csv", _HDR16)
    best_by_rep, seen = [], set()
    for r in filt:
        if r["representation"] not in seen:
            seen.add(r["representation"])
            best_by_rep.append(r)
    _rows_to_csv(best_by_rep, out_dir / "best_filtered_by_representation.csv",
                 _HDR16)

    # per-metric bars: top run per (representation, algo) (17:62-84)
    for metric, fname, title in (
            ("silhouette", "plot_silhouette.png",
             "Best (filtered) Silhouette by Representation/Algorithm"),
            ("davies_bouldin", "plot_davies_bouldin.png",
             "Best (filtered) Davies-Bouldin (lower is better)"),
            ("ari", "plot_ari.png",
             "Best (filtered) Adjusted Rand Index (ARI)")):
        d = [r for r in filt if r[metric] is not None]
        top, seen2 = [], set()
        for r in d:
            key = (r["representation"], r["algo"])
            if key not in seen2:
                seen2.add(key)
                top.append({**r, "label": f"{r['representation']} | "
                            f"{r['algo']} | {r['params']}"})
        if top:
            plots.grouped_bars(top, "label", [metric], out_dir / fname, title)

    # DBSCAN diagnostics per representation (17:88-144)
    db = [r for r in rows if r["algo"] == "dbscan"]
    for rep_name in sorted({r["representation"] for r in db}):
        g = [r for r in db if r["representation"] == rep_name]
        for r in g:
            parts = dict(p.split("=") for p in r["params"].split(","))
            r["_eps"], r["_min"] = float(parts["eps"]), int(parts["min"])
        ms_all = sorted({r["_min"] for r in g})
        ms_used = 5 if 5 in ms_all else ms_all[0]
        g2 = sorted([r for r in g if r["_min"] == ms_used],
                    key=lambda r: r["_eps"])
        plots.line_sweep([r["_eps"] for r in g2],
                         [r["noise_frac"] for r in g2],
                         out_dir / f"dbscan_noise_vs_eps_{rep_name}.png",
                         "eps", "noise_frac",
                         f"DBSCAN noise fraction vs eps ({rep_name}, "
                         f"min_samples={ms_used})")
        plots.line_sweep([r["_eps"] for r in g2],
                         [r["n_clusters_found"] for r in g2],
                         out_dir / f"dbscan_clusters_vs_eps_{rep_name}.png",
                         "eps", "clusters_found (excluding noise)",
                         f"DBSCAN clusters found vs eps ({rep_name}, "
                         f"min_samples={ms_used})")
    return {"filtered": filt, "best_by_rep": best_by_rep, "out_dir": out_dir}


# ---------------------------------------------------------------------------
# Script 14: generic clustering visualization
# ---------------------------------------------------------------------------


def visualize_clustering(ws: Workspace, repr_path: Path, ids_path: Path,
                         genre_map: Optional[Dict] = None,
                         method: str = "kmeans", n_clusters: int = 6,
                         eps: float = 0.6, min_samples: int = 5,
                         proj: str = "pca", standardize: bool = False,
                         pre_pca_dim: int = 50, tag: str = "run",
                         seed: int = 42,
                         x_arr: Optional[np.ndarray] = None,
                         ids_arr: Optional[np.ndarray] = None,
                         yhat_arr: Optional[np.ndarray] = None) -> Dict:
    """x_arr/ids_arr: optional in-memory representation overriding the
    on-disk files (repr_path/ids_path then only label the outputs) — lets
    the pipeline run viz before the deferred artifact writes land.
    yhat_arr: optional precomputed cluster labels (the pipeline passes the
    script-13/16 cell's labels so the figure is consistent with the metric
    CSVs and the fit is not repeated; method/n_clusters then only label
    the outputs)."""
    from vae_hmc_tpu.cluster.dbscan import dbscan as dbscan_fn
    from vae_hmc_tpu.cluster.agglomerative import agglomerative_ward
    from vae_hmc_tpu.cluster.kmeans import kmeans_fit_predict
    from vae_hmc_tpu.viz.projections import reduce_2d

    out_dir = ws.results / "cluster_viz"
    x = (np.asarray(x_arr, dtype=np.float32) if x_arr is not None
         else np.load(repr_path).astype(np.float32))
    ids = (np.asarray(ids_arr, dtype=np.int64) if ids_arr is not None
           else np.load(ids_path).astype(np.int64))
    if x.ndim > 2:
        x = x.reshape(x.shape[0], -1)
    if standardize:
        x = np.asarray(StandardScaler().fit_transform(x))
    if yhat_arr is not None:
        yhat = np.asarray(yhat_arr)
    elif method == "kmeans":
        yhat = kmeans_fit_predict(x, n_clusters, n_init=10, seed=seed)
    elif method == "agglomerative":
        yhat = agglomerative_ward(x, n_clusters)
    elif method == "dbscan":
        yhat = dbscan_fn(x, eps, min_samples)
    else:
        raise ValueError(method)
    pp = pre_pca_dim if (pre_pca_dim and proj in ("umap", "tsne")) else None
    xy, used = reduce_2d(x, proj, pre_pca_dim=pp)

    base = f"{tag}_{Path(repr_path).stem}_{method}_{used}"
    out = {"clusters_png": plots.scatter_2d(
        xy, yhat, out_dir / f"{base}_clusters.png",
        f"{tag}: {Path(repr_path).stem} | {method} | {used}",
        noise_as_x=(method == "dbscan"))}
    if genre_map is not None:
        y_true = labels_for_ids(ids, genre_map)
        out["truegenre_png"] = plots.scatter_2d(
            xy, y_true, out_dir / f"{base}_truegenre.png",
            f"{tag}: TRUE LABELS (genre) | {used}", legend_title="genre")
    uniq = np.unique(yhat)
    n_noise = int(np.sum(yhat == -1)) if -1 in uniq else 0
    summary = [f"repr={repr_path}", f"ids={ids_path}", f"method={method}"]
    if method in ("kmeans", "agglomerative"):
        summary.append(f"n_clusters={n_clusters}")
    else:
        summary += [f"eps={eps}", f"min_samples={min_samples}"]
    summary += [f"proj={used}", f"standardize={standardize}",
                f"pre_pca_dim={pre_pca_dim}",
                f"n_clusters_found={len([u for u in uniq if u != -1])}",
                f"n_noise={n_noise}", "label_col=genre"]
    (out_dir / f"{base}_summary.txt").write_text("\n".join(summary) + "\n")
    out["labels"] = yhat
    return out


# ---------------------------------------------------------------------------
# Script 15: side-by-side + lyrics DBSCAN eps sweep
# ---------------------------------------------------------------------------


def side_by_side_and_dbscan_sweep(
        ws: Workspace, k: int = 6, dbscan_min_samples: int = 5,
        eps_list: Sequence[float] = (0.2, 0.3, 0.4, 0.5, 0.6, 0.8, 1.0),
        standardize: bool = False, tag: str = "medium",
        seed: int = 42, arrays: Optional[Dict] = None,
        reps: Optional[List] = None) -> Dict:
    """arrays: optional {vae_mm_latents|baseline_mel_flat|
    baseline_lyrics_only: (x, ids)} overriding the on-disk artifacts (lets
    the pipeline pass device-resident features instead of re-reading the
    ~1 GB mel .npy; device arrays are flattened on device).

    reps: optional list of the pipeline's RepData instances (scripts 13/16
    already fit the exact kmeans cells drawn here, and hold each
    representation's cached device distance matrix) — labels are then
    REUSED instead of re-fit, so this figure is guaranteed consistent with
    the metric CSVs, and the lyrics DBSCAN panel + eps sweep run as ONE
    vmapped program from the cached distances instead of recomputing the
    (N, N) matrix twice.  The reference re-fits per script (15:49-76).
    Ignored when standardize=True (the cached cells are unstandardized)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from vae_hmc_tpu.cluster.dbscan import dbscan_sweep as db_sweep
    from vae_hmc_tpu.cluster.kmeans import kmeans_fit_predict
    from vae_hmc_tpu.core.profiling import log
    from vae_hmc_tpu.ops.pca import PCA
    from vae_hmc_tpu.viz.projections import HAVE_UMAP, reduce_2d

    out_dir = ws.results / "cluster_viz"
    out_dir.mkdir(parents=True, exist_ok=True)

    import time as _time
    _t = [_time.perf_counter()]

    def _mark(name):
        now = _time.perf_counter()
        log(f"viz15/{name}: {now - _t[0]:.1f}s")
        _t[0] = now

    def _get(name, path):
        if arrays is not None and name in arrays:
            return arrays[name][0]
        return np.load(ws.data / path).astype(np.float32)

    import jax
    import jax.numpy as jnp
    x_vae = _get("vae_mm_latents", "vae_mm_latents_mu.npy")
    x_mel = _get("baseline_mel_flat", "audio_cnn_mel_X.npy")
    xp_mel = jnp if isinstance(x_mel, jax.Array) else np
    x_mel = x_mel.reshape(x_mel.shape[0], -1).astype(xp_mel.float32)
    x_lyr = _get("baseline_lyrics_only", "lyrics_embeddings.npy")
    if standardize:
        x_vae, x_mel, x_lyr = (np.asarray(StandardScaler().fit_transform(v))
                               for v in (x_vae, x_mel, x_lyr))
    _mark("load")
    rep_by_name = ({r.name: r for r in reps}
                   if (reps and not standardize) else {})

    def _km(name, x):
        r = rep_by_name.get(name)
        if r is not None and r.n == x.shape[0]:
            return r.kmeans_labels(k, n_init=10, seed=seed)
        return kmeans_fit_predict(x, k, n_init=10, seed=seed)

    y_vae = _km("vae_mm_latents", x_vae)
    _mark("kmeans_vae")
    y_mel = _km("baseline_mel_flat", x_mel)
    _mark("kmeans_mel")
    rep_lyr = rep_by_name.get("baseline_lyrics_only")
    if rep_lyr is not None and rep_lyr.n == x_lyr.shape[0]:
        # whole (dbscan panel + eps sweep) grid as ONE vmapped program from
        # the representation's cached device distance matrix
        from vae_hmc_tpu.cluster.dbscan import dbscan_sweep_from_dists_device
        grid_eps = sorted(set(float(e) for e in eps_list) | {0.4})
        labels_by_cell = dbscan_sweep_from_dists_device(
            rep_lyr.dists_dev, grid_eps, [dbscan_min_samples])
        y_lyr_db = labels_by_cell[(0.4, dbscan_min_samples)]
    else:
        from vae_hmc_tpu.cluster.dbscan import dbscan as dbscan_fn
        y_lyr_db = dbscan_fn(x_lyr, 0.4, dbscan_min_samples)
        labels_by_cell = None
    _mark("dbscan_lyr")

    def pca2(v):
        return np.asarray(PCA(2).fit_transform(v))

    panels = [(pca2(x_vae), y_vae, f"VAE latents + KMeans(k={k}) | PCA"),
              (pca2(x_mel), y_mel, f"Mel(flat) + KMeans(k={k}) | PCA"),
              (pca2(x_lyr), y_lyr_db,
               "Lyrics + DBSCAN(eps=0.4) | PCA (noise likely)")]
    _mark("pca2x3")
    if HAVE_UMAP:
        rep3 = [rep_by_name.get(nm) for nm in
                ("vae_mm_latents", "baseline_mel_flat",
                 "baseline_lyrics_only")]
        # Embed from the sweep's cached per-representation device distance
        # matrices wherever a matching RepData exists (the from-x fallback
        # recomputes the (N, N) distances AND compiles one program per
        # (N, d) input shape).  Same-N reps stack into ONE scanned
        # program/dispatch; the lyrics rep legitimately has FEWER rows than
        # the audio reps whenever text coverage < 1 (production manifests:
        # round-5 floor run measured ns=[2924, 2924, 2652]), so the old
        # all-three-equal-N batch condition never triggered at scale and
        # every tier run silently paid the 3x from-x path.
        from vae_hmc_tpu.viz.umap import (umap_2d_from_dists,
                                          umap_2d_from_dists_batch)
        use_ul = bool(os.environ.get("VAE_HMC_USE_UMAP_LEARN"))
        xs = [x_vae, x_mel, x_lyr]
        embeds: list = [None, None, None]
        groups: Dict[int, list] = {}
        for i, (r, xv) in enumerate(zip(rep3, xs)):
            if r is not None and not use_ul and r.n == xv.shape[0]:
                groups.setdefault(r.n, []).append(i)
        log(f"viz15/umap path: groups={list(groups.values())} "
            f"(ns={[getattr(r, 'n', None) for r in rep3]}, "
            f"from-x fallbacks="
            f"{[i for i in range(3) if not any(i in g for g in groups.values())]})")
        for idxs in groups.values():
            if len(idxs) > 1:
                u = umap_2d_from_dists_batch(
                    [rep3[i].dists_dev for i in idxs])
                for j, i in enumerate(idxs):
                    embeds[i] = u[j]
            else:
                embeds[idxs[0]] = umap_2d_from_dists(rep3[idxs[0]].dists_dev)
        for i, xv in enumerate(xs):
            if embeds[i] is None:
                embeds[i] = reduce_2d(xv, "umap")[0]
        u_vae, u_mel, u_lyr = embeds
        panels_u = [(u_vae, y_vae, f"VAE latents + KMeans(k={k}) | UMAP"),
                    (u_mel, y_mel, f"Mel(flat) + KMeans(k={k}) | UMAP"),
                    (u_lyr, y_lyr_db,
                     "Lyrics + DBSCAN(eps=0.4) | UMAP (noise likely)")]
        _mark("umap_x3")
        fig, axes = plt.subplots(3, 2, figsize=(12, 16))
        for i in range(3):
            for j, (xy, y, t) in enumerate((panels[i], panels_u[i])):
                axes[i, j].scatter(xy[:, 0], xy[:, 1], c=y, s=6, cmap="tab10")
                axes[i, j].set_title(t, fontsize=9)
    else:
        fig, axes = plt.subplots(3, 1, figsize=(10, 16))
        for i, (xy, y, t) in enumerate(panels):
            axes[i].scatter(xy[:, 0], xy[:, 1], c=y, s=6, cmap="tab10")
            axes[i].set_title(t, fontsize=9)
    fig.tight_layout()
    side_png = out_dir / f"side_by_side_{tag}.png"
    fig.savefig(side_png, dpi=220)
    plt.close(fig)
    _mark("figure")

    if labels_by_cell is None:
        labels_by_cell = db_sweep(x_lyr, eps_list, [dbscan_min_samples])
    _mark("dbscan_sweep")
    n_clusters_list, n_noise_list = [], []
    for eps in eps_list:
        y = labels_by_cell[(float(eps), dbscan_min_samples)]
        uniq = np.unique(y)
        n_noise_list.append(int(np.sum(y == -1)) if -1 in uniq else 0)
        n_clusters_list.append(len([u for u in uniq.tolist() if u != -1]))
    p1 = plots.line_sweep(list(eps_list), n_clusters_list,
                          out_dir / f"lyrics_dbscan_eps_sweep_clusters_{tag}.png",
                          "DBSCAN eps", "Clusters found (excluding noise)",
                          "Lyrics DBSCAN: eps vs clusters found")
    p2 = plots.line_sweep(list(eps_list), n_noise_list,
                          out_dir / f"lyrics_dbscan_eps_sweep_noise_{tag}.png",
                          "DBSCAN eps", "Noise points (-1)",
                          "Lyrics DBSCAN: eps vs number of noise points")
    return {"side_by_side": side_png, "sweep_clusters": p1, "sweep_noise": p2}


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------


def run_medium_pipeline(source: Source, ws: Workspace,
                        mel_cfg: MelConfig = MelConfig(),
                        text_cfg: TextEmbedConfig = TextEmbedConfig(),
                        vae_cfg: ConvMMVaeConfig = ConvMMVaeConfig(),
                        sweep_cfg: SweepConfig = SweepConfig(),
                        with_viz: bool = True, device_batch: int = 32,
                        verbose: bool = False,
                        write_mel_features: bool = True,
                        save_epoch_checkpoints: bool = True,
                        hbm_resident: bool = True) -> Dict:
    """hbm_resident=True (default): the (N, 128, T) mel tensor lives on
    device for the whole pipeline — feature extraction feeds training and
    the sweep in place, and the only full-tensor device->host fetch is the
    optional audio_cnn_mel_X.npy write (write_mel_features)."""
    from vae_hmc_tpu.core.profiling import StageTimer, warm_connection
    timer = StageTimer()
    warm_connection(timer)
    n_src = len(source)
    genre_map = {int(t): str(g) for t, g in zip(source.track_ids,
                                                source.genres)}
    # Speculative AOT train setup on a thread (round 5): the fused trainer's
    # init dispatch + Python trace + executable cache-load need only shapes,
    # and the tunnel is idle while the scanned feature program owns the
    # device.  Planned from the source row count; if the feature build drops
    # non-finite rows the shapes won't match and train_conv_mm falls back to
    # the plain path (tolerant consume there) — correctness never depends on
    # the speculation.  Bit-identity: tests/test_prepared_fit.py.
    import threading
    _prep_box: Dict = {}

    def _prepare_train():
        try:
            _prep_box["prep"] = model_api.prepare_conv_mm_vae(
                n_src, (mel_cfg.n_mels, mel_cfg.n_frames, 1),
                text_cfg.embed_dim, vae_cfg)
        except Exception as e:          # speculation only — never fatal
            _prep_box["err"] = e

    _prep_thread = threading.Thread(target=_prepare_train, daemon=True)
    _prep_thread.start()
    with timer.stage("build_audio_features", n_src):
        a = build_audio_features(source, ws, mel_cfg, device_batch,
                                 write_features=write_mel_features,
                                 hbm_resident=hbm_resident)
    with timer.stage("build_lyrics_embeddings", n_src):
        l = build_lyrics_embeddings(source, ws, text_cfg)
    # artifact writes (incl. the checkpoint-param device fetch) overlap the
    # viz stages below; joined before anything reads the files.  The gate
    # holds the 342 MB fetch past the dispatch-heavy cluster/sweep stages:
    # round-5 floor measurement (--no-epoch-ckpt) put cluster_and_evaluate
    # at 10.4 s uncontended vs 17.8 s sharing the ~33 MB/s tunnel with the
    # fetch — whereas viz15 is one compute-bound UMAP dispatch plus host
    # matplotlib, so overlapping the fetch there is nearly free.
    gate = threading.Event()
    with timer.stage("train_conv_mm", n_src):
        _prep_thread.join()
        if "err" in _prep_box:
            from vae_hmc_tpu.core.profiling import log as _plog
            _plog(f"train12: speculative prepare failed "
                  f"({_prep_box['err']}); using in-line setup")
        t = train_conv_mm(ws, vae_cfg, verbose=verbose, audio=a, lyrics=l,
                          save_epoch_checkpoints=save_epoch_checkpoints,
                          defer_artifacts=True, artifact_gate=gate,
                          prepared=_prep_box.get("prep"))
    arrays = {"vae_mm_latents": (t["latents"], t["ids"]),
              "baseline_mel_flat": (a["x"], a["ids"]),
              "baseline_lyrics_only": (l["emb"], l["ids"])}
    # ONE RepData per representation, shared by scripts 13 and 16: the device
    # distance matrix, its single host fetch, and the ward linkage are each
    # computed exactly once per representation for the whole pipeline.
    try:
        with timer.stage("build_representations", n_src):
            reps = _load_reps(ws, genre_map, standardize=False,
                              names=sweep_cfg.representations, arrays=arrays)
            for r in reps:
                r.dists  # join the host-dists prefetch (ward's input)
        with timer.stage("cluster_and_evaluate", n_src):
            c13 = cluster_and_evaluate(ws, genre_map, n_clusters=6, reps=reps)
        with timer.stage("full_clustering_sweep", n_src):
            c16 = full_clustering_sweep(ws, genre_map, sweep_cfg, reps=reps)
    finally:
        gate.set()       # never leave the artifact thread gated
    with timer.stage("report_tables_and_plots", n_src):
        rep = report_tables_and_plots(ws)
    out = {"audio": a, "lyrics": l, "train": t, "suite": c13, "sweep": c16,
           "report": rep}
    # try/finally: a viz exception must not skip the artifact join — the
    # background thread's own failure (the 342 MB checkpoint fetch is the
    # tier's most failure-prone I/O) would otherwise be silently discarded,
    # leaving truncated ckpt/latent files behind a misleading viz traceback.
    try:
        if with_viz:
            # viz14 takes the in-memory latents (round 4) so the deferred
            # artifact thread — dominated by the 342 MB checkpoint-param
            # fetch — overlaps EVERY downstream stage and is joined only at
            # the end, instead of gating viz14 on the latent .npy write
            with timer.stage("visualize_clustering", n_src):
                rep_vae = next((r for r in reps
                                if r.name == "vae_mm_latents"), None)
                out["viz14"] = visualize_clustering(
                    ws, ws.data / "vae_mm_latents_mu.npy",
                    ws.data / "vae_mm_latents_track_ids.npy", genre_map,
                    method="kmeans", n_clusters=6, proj="pca",
                    tag="vae_kmeans6", x_arr=t["latents"], ids_arr=t["ids"],
                    yhat_arr=(rep_vae.kmeans_labels(6, n_init=10, seed=42)
                              if rep_vae is not None else None))
            with timer.stage("side_by_side_and_dbscan_sweep", n_src):
                out["viz15"] = side_by_side_and_dbscan_sweep(
                    ws, k=6, arrays=arrays, reps=reps)
    finally:
        thread = t.pop("artifact_thread", None)
        if thread is not None:
            with timer.stage("train_artifact_join", n_src):
                thread.join_and_raise()
    timer.save(ws.results / "timing_medium.json")
    out["timing"] = timer.report()
    from vae_hmc_tpu.core import goldens
    out["quality_drift"] = goldens.check_tier("medium", ws.results, n_src)
    return out
