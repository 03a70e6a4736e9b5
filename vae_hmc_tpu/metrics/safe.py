"""NaN-safe, noise-aware metric wrappers.

The reference copy-pastes these across scripts 09/13/16/20 (reference
scripts/09:49-60, 13:62-112, 16:57-106, 20:40-47); single implementation here.
Conventions preserved exactly:
  - silhouette / Davies-Bouldin drop DBSCAN noise points (label == -1) before
    scoring and return None when fewer than 2 clusters remain (13:62-100);
  - ARI keeps noise points as a regular label (13:103-111);
  - failures degrade to None instead of raising (the reference catches broad
    exceptions so a degenerate sweep cell doesn't kill a 102-cell run).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from vae_hmc_tpu.metrics import external, internal


def _drop_noise(x, labels):
    labels = np.asarray(labels)
    keep = labels != -1
    return np.asarray(x)[keep], labels[keep]


def safe_silhouette(x, labels) -> Optional[float]:
    try:
        xk, lk = _drop_noise(x, labels)
        if len(np.unique(lk)) < 2 or len(lk) < 3:
            return None
        return internal.silhouette(xk, lk)
    except Exception:
        return None


def safe_davies_bouldin(x, labels) -> Optional[float]:
    try:
        xk, lk = _drop_noise(x, labels)
        if len(np.unique(lk)) < 2:
            return None
        return internal.davies_bouldin(xk, lk)
    except Exception:
        return None


def safe_calinski_harabasz(x, labels) -> Optional[float]:
    try:
        xk, lk = _drop_noise(x, labels)
        if len(np.unique(lk)) < 2:
            return None
        return internal.calinski_harabasz(xk, lk)
    except Exception:
        return None


def safe_ari(labels_pred, labels_true) -> Optional[float]:
    try:
        return external.adjusted_rand_index(labels_pred, labels_true)
    except Exception:
        return None


def noise_fraction(labels) -> float:
    labels = np.asarray(labels)
    if labels.size == 0:
        return 0.0
    return float(np.mean(labels == -1))


def n_effective_clusters(labels) -> int:
    labels = np.asarray(labels)
    return int(len(np.unique(labels[labels != -1])))
