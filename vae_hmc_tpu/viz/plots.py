"""Matplotlib plot writers matching the reference's output filenames.

Covers the plot artifacts of scripts 08/09/14/15/17/19/21/22.  All functions
take data + a path and write a .png; matplotlib is imported lazily with the
Agg backend so headless runs work and the compute path never depends on it.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Sequence

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def _save(fig, path: Path, dpi: int = 200):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=dpi, bbox_inches="tight")
    import matplotlib.pyplot as plt
    plt.close(fig)
    return path


def pca_variance_plot(explained_ratio: np.ndarray, path: Path,
                      title: str) -> Path:
    """Cumulative + per-component explained variance (reference 09:93-131)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 6))
    comp = np.arange(1, len(explained_ratio) + 1)
    ax.bar(comp, explained_ratio, alpha=0.6, label="per component")
    ax.plot(comp, np.cumsum(explained_ratio), "o-", color="tab:red",
            label="cumulative")
    ax.set_xlabel("principal component")
    ax.set_ylabel("explained variance ratio")
    ax.set_title(title)
    ax.legend()
    return _save(fig, path)


def scatter_2d(xy: np.ndarray, labels: np.ndarray, path: Path, title: str,
               noise_as_x: bool = False, legend_title: str = "cluster") -> Path:
    """Colored 2-D scatter (reference 08:122-131, 14:102-150, 21:96-98).

    noise_as_x: draw label==-1 points as grey 'x' (DBSCAN noise, 14:107-110).
    """
    plt = _plt()
    fig, ax = plt.subplots(figsize=(9, 7))
    labels = np.asarray(labels)
    uniq = [u for u in np.unique(labels) if not (noise_as_x and u == -1)]
    cmap = plt.get_cmap("tab10" if len(uniq) <= 10 else "tab20")
    for i, u in enumerate(uniq):
        m = labels == u
        ax.scatter(xy[m, 0], xy[m, 1], s=8, alpha=0.7,
                   color=cmap(i % cmap.N), label=str(u))
    if noise_as_x and np.any(labels == -1):
        m = labels == -1
        ax.scatter(xy[m, 0], xy[m, 1], s=10, marker="x", color="grey",
                   alpha=0.5, label="noise")
    ax.set_title(title)
    ax.legend(title=legend_title, markerscale=2, fontsize=8)
    return _save(fig, path)


def training_curves(history: Sequence[Dict], path: Path,
                    title: str = "training loss") -> Path:
    """total/recon/kl per epoch (reference 19:289-302 training_curve plots)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(9, 5))
    epochs = [h["epoch"] for h in history]
    for k in ("total", "recon", "kl"):
        ax.plot(epochs, [h[k] for h in history], label=k)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.set_title(title)
    ax.legend()
    return _save(fig, path)


def grouped_bars(rows: Sequence[Dict], group_key: str,
                 metric_keys: Sequence[str], path: Path, title: str) -> Path:
    """Grouped bar chart over methods x metrics (reference 22:179-199
    baseline_bars, 17:62-84 per-metric report bars)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 6))
    groups = [str(r[group_key]) for r in rows]
    n_g, n_m = len(groups), len(metric_keys)
    width = 0.8 / n_m
    xs = np.arange(n_g)
    for j, mk in enumerate(metric_keys):
        vals = [float(r.get(mk) if r.get(mk) is not None else np.nan)
                for r in rows]
        ax.bar(xs + j * width, vals, width, label=mk)
    ax.set_xticks(xs + 0.4 - width / 2)
    ax.set_xticklabels(groups, rotation=20, ha="right", fontsize=8)
    ax.set_title(title)
    ax.legend()
    return _save(fig, path)


def stacked_bar_distribution(counts: np.ndarray, row_names: Sequence[str],
                             col_names: Sequence[str], path: Path,
                             title: str) -> Path:
    """Row-normalized stacked bars: cluster composition over genres/languages
    (reference 21:100-117)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 6))
    counts = np.asarray(counts, dtype=np.float64)
    frac = counts / np.maximum(counts.sum(axis=1, keepdims=True), 1.0)
    bottom = np.zeros(len(row_names))
    cmap = plt.get_cmap("tab10")
    for j, cn in enumerate(col_names):
        ax.bar(row_names, frac[:, j], bottom=bottom, label=str(cn),
               color=cmap(j % cmap.N))
        bottom += frac[:, j]
    ax.set_ylabel("fraction")
    ax.set_title(title)
    ax.legend(fontsize=8, bbox_to_anchor=(1.02, 1.0), loc="upper left")
    return _save(fig, path)


def line_sweep(xs: Sequence[float], ys: Sequence[float], path: Path,
               xlabel: str, ylabel: str, title: str) -> Path:
    """Single line plot (reference 15:124-153 DBSCAN eps sweeps)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(xs, ys, "o-")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.grid(alpha=0.3)
    return _save(fig, path)


def recon_overlay(x: np.ndarray, xhat: np.ndarray, path: Path,
                  n_examples: int = 4, title: str = "reconstructions") -> Path:
    """Feature-vector reconstruction overlays (reference 19:304-334)."""
    plt = _plt()
    n = min(n_examples, x.shape[0])
    fig, axes = plt.subplots(n, 1, figsize=(10, 2.2 * n), squeeze=False)
    for i in range(n):
        ax = axes[i][0]
        ax.plot(x[i], label="input", lw=0.8)
        ax.plot(xhat[i], label="recon", lw=0.8)
        if i == 0:
            ax.set_title(title)
            ax.legend(fontsize=8)
    return _save(fig, path)
