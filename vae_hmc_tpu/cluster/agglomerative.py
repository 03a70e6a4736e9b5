"""Agglomerative (Ward) clustering: device distances + NN-chain merge.

Replaces sklearn.cluster.AgglomerativeClustering(linkage='ward') as used in
the medium sweeps (reference scripts/13:125, 16:201).  The O(N^2) pairwise
squared distances come from the device matmul kernel; the merge sequence is
the nearest-neighbor-chain algorithm with Lance-Williams Ward updates — an
inherently sequential O(N^2) host loop that is cheap at N=3k (SURVEY.md §2b:
"host Lance-Williams ward merge loop").  A C++ implementation
(cluster/native) is used when built; the numpy fallback is identical.

Labels match sklearn exactly up to label permutation (tested via ARI == 1).
"""
from __future__ import annotations

import numpy as np

from vae_hmc_tpu.metrics.internal import pairwise_sq_dists


def ward_linkage_matrix(x: np.ndarray) -> np.ndarray:
    """Compute the (N-1, 4) merge sequence [i, j, dist, size] (scipy format,
    unsorted-cluster-id convention: new cluster n + step)."""
    d2 = np.asarray(pairwise_sq_dists(np.asarray(x, np.float32)),
                    dtype=np.float64)
    return ward_linkage_from_sq_dists(d2)


def ward_linkage_from_sq_dists(d2: np.ndarray) -> np.ndarray:
    """Linkage from a precomputed squared-distance matrix (consumed).
    Lets sweep drivers reuse the representation's cached device distances."""
    try:
        from vae_hmc_tpu.cluster.native import ward_nn_chain_native
        return ward_nn_chain_native(np.asarray(d2, dtype=np.float64))
    except Exception:
        return _ward_nn_chain_numpy_from_d2(np.asarray(d2, dtype=np.float64))


def _ward_nn_chain_numpy(x: np.ndarray) -> np.ndarray:
    """NN-chain Ward in numpy (reference implementation for the native one)."""
    d2 = np.asarray(pairwise_sq_dists(np.asarray(x, np.float32)),
                    dtype=np.float64)
    return _ward_nn_chain_numpy_from_d2(d2)


def _ward_nn_chain_numpy_from_d2(d2: np.ndarray) -> np.ndarray:
    # Lance-Williams update for Ward on squared distances:
    # d2(k, i∪j) = ((si+sk) d2(k,i) + (sj+sk) d2(k,j) - sk d2(i,j)) / (si+sj+sk)
    n = d2.shape[0]
    np.fill_diagonal(d2, np.inf)
    size = np.ones(n)
    active = np.ones(n, dtype=bool)
    cluster_id = np.arange(n)            # scipy-style ids; merged -> n + step
    merges = np.zeros((n - 1, 4))
    chain: list = []
    for step in range(n - 1):
        if not chain:
            chain.append(int(np.flatnonzero(active)[0]))
        while True:
            a = chain[-1]
            row = np.where(active, d2[a], np.inf).copy()
            row[a] = np.inf
            b = int(np.argmin(row))
            if len(chain) > 1 and b == chain[-2]:
                break
            chain.append(b)
        b = chain.pop()
        a = chain.pop()
        dist = np.sqrt(d2[a, b])
        ia, ib = cluster_id[a], cluster_id[b]
        lo, hi = (ia, ib) if ia < ib else (ib, ia)
        merges[step] = (lo, hi, dist, size[a] + size[b])
        # Lance-Williams Ward update into slot a; deactivate b
        sa, sb = size[a], size[b]
        sk = size
        with np.errstate(invalid="ignore"):
            new = ((sa + sk) * d2[a] + (sb + sk) * d2[b] - sk * d2[a, b]) / (
                sa + sb + sk)
        d2[a, :] = new
        d2[:, a] = new
        d2[a, a] = np.inf
        active[b] = False
        d2[b, :] = np.inf
        d2[:, b] = np.inf
        size[a] = sa + sb
        cluster_id[a] = n + step
    # scipy expects merges sorted by distance (NN-chain emits unsorted)
    order = np.argsort(merges[:, 2], kind="stable")
    merges = merges[order]
    # relabel cluster ids to the sorted merge order
    relabel = {}
    for i in range(n):
        relabel[i] = i
    old_new = {}
    for new_step, old_step in enumerate(order):
        old_new[n + old_step] = n + new_step
    for step in range(n - 1):
        for col in (0, 1):
            v = int(merges[step, col])
            if v >= n:
                merges[step, col] = old_new[v]
    return merges


def cut_tree_n_clusters(merges: np.ndarray, n: int, n_clusters: int) -> np.ndarray:
    """Labels from the linkage matrix by undoing the last n_clusters-1 merges
    (sklearn AgglomerativeClustering semantics).  Label ids are assigned by
    first occurrence order over samples 0..N-1, matching nothing in
    particular — compare via ARI."""
    parent = np.arange(n + len(merges))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    stop = len(merges) - (n_clusters - 1)
    for step in range(stop):
        i, j = int(merges[step, 0]), int(merges[step, 1])
        parent[find(i)] = n + step
        parent[find(j)] = n + step
    roots = np.asarray([find(i) for i in range(n)])
    _, labels = np.unique(roots, return_inverse=True)
    return labels.astype(np.int32)


def agglomerative_ward(x: np.ndarray, n_clusters: int) -> np.ndarray:
    merges = ward_linkage_matrix(x)
    return cut_tree_n_clusters(merges, len(x), n_clusters)
