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


def _refine_threshold_band(x32: np.ndarray, d2: np.ndarray,
                           eps: float) -> np.ndarray:
    """Exact-f64 recompute of squared distances within the f32 cancellation
    band of eps^2; returns d2 with those entries replaced.

    The bulk (N, N) matrix comes from the MXU dot trick |a|^2+|b|^2-2ab in
    f32, whose absolute error scales with the row norms — for points whose
    true distance is within that error of eps, the <= eps decision can flip
    vs sklearn (whose KDTree accumulates (a-b)^2 in float64; observed on a
    border point at d=0.29999402 vs eps=0.3).  Only the handful of
    threshold-adjacent pairs are recomputed, as (a-b)^2 in f64 on host, so
    the adjacency is sklearn-f64-exact while the O(N^2 d) bulk stays on the
    MXU."""
    thr = float(eps) * float(eps)
    norms = (x32.astype(np.float64) ** 2).sum(axis=1)
    # conservative dot-trick error bound: O(d) ulps of the largest term
    err = ((x32.shape[1] + 16) * np.finfo(np.float32).eps
           * (norms[:, None] + norms[None, :] + thr))
    band = np.abs(d2 - thr) <= err
    band |= band.T
    ii, jj = np.nonzero(band)
    if ii.size:
        diff = x32[ii].astype(np.float64) - x32[jj].astype(np.float64)
        d2 = d2.astype(np.float64, copy=True)
        d2[ii, jj] = np.einsum("ij,ij->i", diff, diff)
    return d2


def neighbor_graph(x: np.ndarray, eps: float) -> np.ndarray:
    """(N, N) bool adjacency: ||xi - xj|| <= eps (self included, as sklearn).

    Bulk distances via the device MXU dot trick; threshold-adjacent pairs
    refined in f64 (_refine_threshold_band) for sklearn-exact decisions."""
    x32 = np.asarray(x, np.float32)
    d2 = np.asarray(pairwise_sq_dists(x32))
    return _refine_threshold_band(x32, d2, eps) <= eps * eps


def labels_from_adjacency(adj: np.ndarray, min_samples: int) -> np.ndarray:
    """sklearn-exact DBSCAN labels from a boolean epsilon-adjacency matrix.

    Vectorized equivalent of sklearn's seed-order BFS (dbscan_inner):
      - clusters = connected components of the core-core subgraph, with ids
        assigned in order of each component's lowest core index (that IS the
        seed order sklearn expands in);
      - border points take the minimum cluster id among their core neighbors
        (sklearn expands lower-id clusters to completion first, so the
        first cluster to reach a border point is the lowest-id one);
      - everything else is noise (-1).
    The scipy connected-components pass replaces a per-point python BFS —
    the host-side cost that dominated the 72 DBSCAN sweep cells.
    """
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csgraph

    n = adj.shape[0]
    core = adj.sum(axis=1) >= min_samples          # self-inclusive (sklearn)
    labels = np.full(n, -1, dtype=np.int64)
    core_idx = np.flatnonzero(core)
    if core_idx.size == 0:
        return labels
    sub = sp.csr_matrix(adj[np.ix_(core_idx, core_idx)])
    n_comp, comp = csgraph.connected_components(sub, directed=False)
    # component id -> cluster id ordered by lowest core index (seed order)
    first_seen = np.full(n_comp, n, dtype=np.int64)
    np.minimum.at(first_seen, comp, core_idx)
    order = np.argsort(first_seen, kind="stable")
    comp_to_cluster = np.empty(n_comp, dtype=np.int64)
    comp_to_cluster[order] = np.arange(n_comp)
    labels[core_idx] = comp_to_cluster[comp]
    # border points: min cluster id among core neighbors
    border = np.flatnonzero(~core & adj[:, core_idx].any(axis=1))
    if border.size:
        nb = adj[np.ix_(border, core_idx)]
        core_labels = labels[core_idx]
        big = np.where(nb, core_labels[None, :], np.iinfo(np.int64).max)
        labels[border] = big.min(axis=1)
    return labels


def _label_body(adj, min_samples):
    """On-device sklearn-exact labeling from a boolean adjacency matrix.
    Plain traceable function: jitted directly for single cells and vmapped
    over the (eps, min_samples) grid for sweeps."""
    import jax
    import jax.numpy as jnp
    n = adj.shape[0]
    adj = adj & adj.T                    # symmetry guard (distances are)
    core = jnp.sum(adj, axis=1) >= min_samples
    # min-core-index propagation over the core-core subgraph to fixpoint:
    # root[i] = lowest core index reachable from core i.  Each sweep is
    # one (N, N) masked min-reduce on device; converges in O(graph
    # diameter) sweeps (dense eps-graphs: a handful).
    idx = jnp.arange(n)
    big = jnp.asarray(n, jnp.int32)
    core_adj = adj & core[:, None] & core[None, :]
    root0 = jnp.where(core, idx, big).astype(jnp.int32)

    def cond(carry):
        root, changed = carry
        return changed

    def sweep(carry):
        root, _ = carry
        nbr_min = jnp.min(jnp.where(core_adj, root[None, :], big), axis=1)
        new = jnp.minimum(root, nbr_min)
        return new, jnp.any(new != root)

    root, _ = jax.lax.while_loop(cond, sweep,
                                 (root0, jnp.asarray(True)))
    # cluster id = rank of the component's root among distinct roots
    # (sklearn's seed order: components numbered by lowest core index)
    is_root = core & (root == idx)
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1     # inclusive - 1
    safe_root = jnp.clip(root, 0, n - 1)
    core_label = rank[safe_root]
    # border points: min cluster id among core neighbors (the lowest-id
    # cluster reaches a border point first in sklearn's expansion order)
    nbr_core_label = jnp.where(adj & core[None, :],
                               core_label[None, :], big)
    border_label = jnp.min(nbr_core_label, axis=1)
    labels = jnp.where(
        core, core_label,
        jnp.where(border_label < big, border_label, -1))
    return labels.astype(jnp.int32)


_DEVICE_LABEL = None


def labels_from_adjacency_device(adj, min_samples: int) -> np.ndarray:
    """sklearn-exact DBSCAN labels computed ON DEVICE from a device boolean
    adjacency matrix; only the (N,) label vector is fetched (the host path
    costs a 34 MB distance-matrix readback per representation on this
    tunnel).  Parity with labels_from_adjacency is tested directly."""
    global _DEVICE_LABEL
    if _DEVICE_LABEL is None:
        import jax
        _DEVICE_LABEL = jax.jit(_label_body)
    return np.asarray(_DEVICE_LABEL(adj, min_samples), dtype=np.int64)


def dbscan_from_dists_device(d, eps: float, min_samples: int) -> np.ndarray:
    """DBSCAN from a device (N, N) euclidean distance matrix, no readback."""
    return labels_from_adjacency_device(d <= eps, min_samples)


_DEVICE_LABEL_SWEEP = None


def dbscan_sweep_from_dists_device(d, eps_values, min_samples_values,
                                   squared: bool = False):
    """Labels for the whole (eps x min_samples) grid as ONE vmapped device
    program and ONE host fetch — the per-cell path pays a dispatch + (N,)
    fetch round-trip per cell (24 cells/representation in the script-16
    grid).  The vmapped while_loop runs every cell until the slowest
    converges; adjacency memory is (C, N, N) bool (~205 MB for the full
    grid at N=2924).

    squared=True: `d` holds SQUARED distances and thresholds are eps^2
    (the dbscan()/dbscan_sweep() x-input path).
    -> {(eps, min_samples): (N,) int64 labels}
    """
    global _DEVICE_LABEL_SWEEP
    import jax
    import jax.numpy as jnp
    if _DEVICE_LABEL_SWEEP is None:
        @jax.jit
        def sweep_impl(dd, thr_arr, ms_arr):
            adjs = dd[None, :, :] <= thr_arr[:, None, None]
            return jax.vmap(_label_body)(adjs, ms_arr)

        _DEVICE_LABEL_SWEEP = sweep_impl
    pairs = [(float(e), int(m)) for e in eps_values
             for m in min_samples_values]
    thr = jnp.asarray([e * e if squared else e for e, _ in pairs],
                      jnp.float32)
    ms = jnp.asarray([m for _, m in pairs], jnp.int32)
    labels = np.asarray(_DEVICE_LABEL_SWEEP(jnp.asarray(d, jnp.float32),
                                            thr, ms))
    return {p: labels[i].astype(np.int64) for i, p in enumerate(pairs)}


def dbscan(x, eps: float, min_samples: int = 5) -> np.ndarray:
    import jax
    if isinstance(x, jax.Array):
        import jax.numpy as jnp
        d2 = pairwise_sq_dists(x.reshape(x.shape[0], -1))
        return labels_from_adjacency_device(d2 <= eps * eps, min_samples)
    return labels_from_adjacency(neighbor_graph(x, eps), min_samples)


def dbscan_sweep(x, eps_values, min_samples_values):
    """Grid over (eps, min_samples) sharing ONE device distance matrix —
    the reference recomputes distances per cell (16:219-242).  Device inputs
    never leave the device (labels excepted)."""
    import jax
    if isinstance(x, jax.Array):
        d2 = pairwise_sq_dists(x.reshape(x.shape[0], -1))
        return dbscan_sweep_from_dists_device(d2, eps_values,
                                              min_samples_values,
                                              squared=True)
    x32 = np.asarray(x, np.float32)
    d2 = np.asarray(pairwise_sq_dists(x32))
    out = {}
    for eps in eps_values:
        adj = _refine_threshold_band(x32, d2, eps) <= eps * eps
        for ms in min_samples_values:
            out[(float(eps), int(ms))] = labels_from_adjacency(adj, ms)
    return out
