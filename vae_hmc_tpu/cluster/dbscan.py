"""DBSCAN: device epsilon-graph + host BFS labeling (sklearn-exact).

Replaces sklearn.cluster.DBSCAN as used in the medium sweeps (reference
scripts/13:131, 14:77, 15:87, 16:221).  The expensive part — the (N, N)
neighborhood graph — is one device distance matmul (SURVEY.md §2b: "dense
pairwise-distance epsilon-graph on device"); labeling is sklearn's exact
algorithm: iterate seeds in index order, expand clusters over core points,
border points take the label of the first cluster that reaches them.
Matches sklearn labels exactly (including noise = -1), tested directly.
"""
from __future__ import annotations

import numpy as np

from vae_hmc_tpu.metrics.internal import pairwise_sq_dists


def neighbor_graph(x: np.ndarray, eps: float) -> np.ndarray:
    """(N, N) bool adjacency: ||xi - xj|| <= eps (self included, as sklearn)."""
    d2 = np.asarray(pairwise_sq_dists(np.asarray(x, np.float32)))
    return d2 <= eps * eps


def dbscan(x: np.ndarray, eps: float, min_samples: int = 5) -> np.ndarray:
    adj = neighbor_graph(x, eps)
    n = adj.shape[0]
    n_neighbors = adj.sum(axis=1)                  # self-inclusive count
    core = n_neighbors >= min_samples
    labels = np.full(n, -1, dtype=np.int64)
    cluster = 0
    neighbors = [np.flatnonzero(adj[i]) for i in range(n)]
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        # BFS from seed i over core points (sklearn dbscan_inner)
        labels[i] = cluster
        stack = [i]
        while stack:
            p = stack.pop()
            if not core[p]:
                continue
            for q in neighbors[p]:
                if labels[q] == -1:
                    labels[q] = cluster
                    if core[q]:
                        stack.append(q)
        cluster += 1
    return labels


def dbscan_sweep(x: np.ndarray, eps_values, min_samples_values):
    """Grid over (eps, min_samples) sharing ONE device distance matrix —
    the reference recomputes distances per cell (16:219-242)."""
    d2 = np.asarray(pairwise_sq_dists(np.asarray(x, np.float32)))
    n = d2.shape[0]
    out = {}
    for eps in eps_values:
        adj = d2 <= eps * eps
        neighbors = [np.flatnonzero(adj[i]) for i in range(n)]
        counts = adj.sum(axis=1)
        for ms in min_samples_values:
            core = counts >= ms
            labels = np.full(n, -1, dtype=np.int64)
            cluster = 0
            for i in range(n):
                if labels[i] != -1 or not core[i]:
                    continue
                labels[i] = cluster
                stack = [i]
                while stack:
                    p = stack.pop()
                    if not core[p]:
                        continue
                    for q in neighbors[p]:
                        if labels[q] == -1:
                            labels[q] = cluster
                            if core[q]:
                                stack.append(q)
                cluster += 1
            out[(float(eps), int(ms))] = labels
    return out
