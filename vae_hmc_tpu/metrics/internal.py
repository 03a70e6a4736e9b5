"""Internal clustering quality metrics, on device, sklearn-parity.

The reference calls sklearn's Cython implementations per sweep cell — the
silhouette over 82k-dim flattened mel spectrograms is its single most
expensive evaluation (reference scripts/16:237, SURVEY.md §3.4).  Here each
metric is one jitted XLA program over an HBM-resident pairwise-distance
matmul: for N=3k the distance matrix is 3k x 3k f32 (~36 MB), trivially
HBM-resident, and the matmul rides the MXU.

Numerics match sklearn.metrics.{silhouette_score, davies_bouldin_score,
calinski_harabasz_score} to f32 tolerance (tests/test_metrics_parity.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vae_hmc_tpu.core.bucketing import bucket_k as _bucket_k


def _as_codes(labels) -> np.ndarray:
    """Labels -> dense 0..k-1 int codes (sorted-unique order, sklearn-style)."""
    labels = np.asarray(labels)
    _, codes = np.unique(labels, return_inverse=True)
    return codes.astype(np.int32)


# _bucket_k (core.bucketing): n_clusters is a STATIC jit argument; a sweep
# whose cells find many distinct cluster counts (DBSCAN especially) would
# compile one program per count per operand shape — the bulk of the ~40
# cold-start compiles measured in round 2 (VALIDATION.md).  The masked
# metric programs tolerate trailing always-empty clusters exactly (empty
# columns are masked out of every reduction), so padding k to a bucket
# collapses the program count to the handful of bucket sizes.


@jax.jit
def _pairwise_sq_impl(x, y):
    xn = jnp.sum(x * x, axis=1)[:, None]
    yn = jnp.sum(y * y, axis=1)[None, :]
    # HIGHEST precision: full-f32 MXU passes.  The TPU default (bf16 inputs)
    # destroys the cancellation-sensitive -2ab term and shows up as ~1e-3
    # absolute error in sklearn-parity metrics.
    d2 = xn + yn - 2.0 * jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(d2, 0.0)


def pairwise_sq_dists(x: jax.Array, y: jax.Array | None = None) -> jax.Array:
    """Squared euclidean distances via the MXU: |a|^2 + |b|^2 - 2ab, clamped.

    Mean-centering the features first keeps |a|^2 small relative to the cross
    term, which is what keeps f32 cancellation error acceptable on
    high-dimensional inputs (the 82k-dim mel-flat representation).

    Jitted: eager call sites (dbscan/agglomerative/sweep distance caches)
    otherwise pay ~5 separate device dispatches for the op chain.
    """
    x = jnp.asarray(x, jnp.float32)
    y = x if y is None else jnp.asarray(y, jnp.float32)
    return _pairwise_sq_impl(x, y)


@jax.jit
def centered_euclidean_dists(x: jax.Array) -> jax.Array:
    """(N, ...) -> (N, N) euclidean distances of mean-centered flattened
    rows, as ONE program (the sweep's per-representation distance cache)."""
    x = x.reshape(x.shape[0], -1).astype(jnp.float32)
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    return jnp.sqrt(pairwise_sq_dists(xc))


def _center(x: jax.Array) -> jax.Array:
    return x - jnp.mean(x, axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("n_clusters",))
def _silhouette_impl(x, codes, n_clusters: int):
    x = _center(jnp.asarray(x, jnp.float32))
    d = jnp.sqrt(pairwise_sq_dists(x))
    return _silhouette_from_d(d, codes, n_clusters)


@partial(jax.jit, static_argnames=("n_clusters",))
def _silhouette_from_d(d, codes, n_clusters: int):
    onehot = jax.nn.one_hot(codes, n_clusters, dtype=jnp.float32)   # (N, k)
    counts = jnp.sum(onehot, axis=0)                                 # (k,)
    sums = jnp.matmul(d, onehot, precision=jax.lax.Precision.HIGHEST)  # (N, k) sum dist to cluster
    own = counts[codes]                                              # cluster size of each point
    intra_sum = jnp.take_along_axis(sums, codes[:, None], axis=1)[:, 0]
    a = intra_sum / jnp.maximum(own - 1.0, 1.0)
    mean_other = sums / jnp.maximum(counts[None, :], 1.0)
    # mask own cluster and empty clusters with +inf before min
    mask = (jax.nn.one_hot(codes, n_clusters, dtype=bool)
            | (counts[None, :] == 0))
    b = jnp.min(jnp.where(mask, jnp.inf, mean_other), axis=1)
    s = (b - a) / jnp.maximum(jnp.maximum(a, b), 1e-30)
    s = jnp.where(own <= 1.0, 0.0, s)   # singleton clusters score 0 (sklearn)
    return jnp.mean(s)


def silhouette(x, labels) -> float:
    """sklearn.metrics.silhouette_score (euclidean, full, no sampling)."""
    codes = _as_codes(labels)
    k = int(codes.max()) + 1 if codes.size else 0
    if k < 2 or k > len(codes) - 1:
        raise ValueError("silhouette requires 2 <= n_labels <= n_samples - 1")
    return float(_silhouette_impl(jnp.asarray(x), jnp.asarray(codes), k))


@partial(jax.jit, static_argnames=("n_clusters",))
def _silhouette_from_d_masked(d, codes, n_clusters: int):
    """Silhouette over the subset codes >= 0 (codes == -1 are excluded),
    computed on the FULL distance matrix — excluded points simply carry zero
    one-hot weight, so no host-side submatrix materialization is needed
    (DBSCAN noise-dropping convention, reference scripts/13:62-81)."""
    valid = codes >= 0
    safe_codes = jnp.where(valid, codes, 0)
    onehot = (jax.nn.one_hot(safe_codes, n_clusters, dtype=jnp.float32)
              * valid[:, None].astype(jnp.float32))
    counts = jnp.sum(onehot, axis=0)
    sums = jnp.matmul(d, onehot, precision=jax.lax.Precision.HIGHEST)
    own = counts[safe_codes]
    intra_sum = jnp.take_along_axis(sums, safe_codes[:, None], axis=1)[:, 0]
    a = intra_sum / jnp.maximum(own - 1.0, 1.0)
    mean_other = sums / jnp.maximum(counts[None, :], 1.0)
    mask = (jax.nn.one_hot(safe_codes, n_clusters, dtype=bool)
            | (counts[None, :] == 0))
    b = jnp.min(jnp.where(mask, jnp.inf, mean_other), axis=1)
    s = (b - a) / jnp.maximum(jnp.maximum(a, b), 1e-30)
    s = jnp.where(own <= 1.0, 0.0, s)
    s = jnp.where(valid, s, 0.0)
    return jnp.sum(s) / jnp.maximum(jnp.sum(valid), 1)


def silhouette_from_dists_masked(d, labels, lazy: bool = False) -> float:
    """Noise-aware silhouette from a precomputed full distance matrix:
    label -1 points are dropped from the score without subsetting d.

    lazy=True returns the 0-d DEVICE scalar without blocking — sweeps
    fetch all cells' scores in one transfer (see sweep.finalize_rows)
    instead of one blocking round-trip per cell."""
    labels = np.asarray(labels)
    kept = labels[labels >= 0]
    classes = np.unique(kept)
    k = len(classes)
    if k < 2 or len(kept) < 3:
        raise ValueError("need >= 2 clusters among non-noise points")
    lut = {c: i for i, c in enumerate(classes)}
    codes = np.asarray([lut.get(l, -1) for l in labels], dtype=np.int32)
    # bucketed k: the (counts == 0) term of `mask` already excludes the
    # padding clusters from b's min, and no point carries their code
    out = _silhouette_from_d_masked(jnp.asarray(d, jnp.float32),
                                    jnp.asarray(codes), _bucket_k(k))
    return out if lazy else float(out)


def silhouette_from_dists(d, labels) -> float:
    """Silhouette from a precomputed (N, N) euclidean distance matrix.

    Lets a sweep reuse ONE device distance matrix across every clustering
    cell — the reference recomputes the O(N^2 d) distances inside sklearn for
    each of its 102 sweep cells (scripts/16:159-244), which on the 82k-dim
    mel-flat representation is its dominant cost (SURVEY.md §3.4)."""
    codes = _as_codes(labels)
    k = int(codes.max()) + 1 if codes.size else 0
    if k < 2 or k > len(codes) - 1:
        raise ValueError("silhouette requires 2 <= n_labels <= n_samples - 1")
    return float(_silhouette_from_d(jnp.asarray(d, jnp.float32),
                                    jnp.asarray(codes), k))


@partial(jax.jit, static_argnames=("n_clusters",))
def _dbi_impl(x, codes, n_clusters: int):
    x = _center(jnp.asarray(x, jnp.float32))
    onehot = jax.nn.one_hot(codes, n_clusters, dtype=jnp.float32)
    counts = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)
    centroids = jnp.matmul(onehot.T, x, precision=jax.lax.Precision.HIGHEST) / counts[:, None]
    # mean intra-cluster distance to centroid
    d_pc = jnp.sqrt(pairwise_sq_dists(x, centroids))                 # (N, k)
    s = jnp.sum(d_pc * onehot, axis=0) / counts                      # (k,)
    m = jnp.sqrt(pairwise_sq_dists(centroids))                       # (k, k)
    r = (s[:, None] + s[None, :]) / jnp.where(m > 0, m, jnp.inf)
    r = jnp.where(jnp.eye(n_clusters, dtype=bool), -jnp.inf, r)
    return jnp.mean(jnp.max(r, axis=1))


def davies_bouldin(x, labels) -> float:
    codes = _as_codes(labels)
    k = int(codes.max()) + 1
    if k < 2:
        raise ValueError("davies_bouldin requires >= 2 clusters")
    return float(_dbi_impl(jnp.asarray(x), jnp.asarray(codes), k))


@partial(jax.jit, static_argnames=("n_clusters",))
def _dbi_impl_masked(x, codes, n_clusters: int):
    """DBI over the subset codes >= 0 (codes == -1 excluded) on the FULL
    feature matrix: noise points carry zero one-hot weight, so a sweep can
    reuse ONE device-resident x across cells instead of uploading a host
    subset per cell (the (N, 82k) mel-flat representation is ~1 GB).
    Distances are translation-invariant, so centering by the full mean
    matches sklearn.davies_bouldin_score(x[keep], labels[keep])."""
    x = _center(jnp.asarray(x, jnp.float32))
    valid = codes >= 0
    safe_codes = jnp.where(valid, codes, 0)
    onehot = (jax.nn.one_hot(safe_codes, n_clusters, dtype=jnp.float32)
              * valid[:, None].astype(jnp.float32))
    raw_counts = jnp.sum(onehot, axis=0)
    nonempty = raw_counts > 0       # bucketed-k padding clusters are empty
    counts = jnp.maximum(raw_counts, 1.0)
    centroids = jnp.matmul(onehot.T, x,
                           precision=jax.lax.Precision.HIGHEST) / counts[:, None]
    d_pc = jnp.sqrt(pairwise_sq_dists(x, centroids))                 # (N, k)
    s = jnp.sum(d_pc * onehot, axis=0) / counts                      # (k,)
    m = jnp.sqrt(pairwise_sq_dists(centroids))                       # (k, k)
    r = (s[:, None] + s[None, :]) / jnp.where(m > 0, m, jnp.inf)
    live = nonempty[:, None] & nonempty[None, :]
    r = jnp.where(live & ~jnp.eye(n_clusters, dtype=bool), r, -jnp.inf)
    per = jnp.where(nonempty, jnp.max(r, axis=1), 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(nonempty), 1)


def davies_bouldin_masked(x, labels, lazy: bool = False) -> float:
    """DBI ignoring noise (label -1) without subsetting x on host.
    lazy=True returns the 0-d device scalar (see silhouette docstring)."""
    labels = np.asarray(labels)
    kept = labels[labels >= 0]
    classes = np.unique(kept)
    k = len(classes)
    if k < 2:
        raise ValueError("davies_bouldin requires >= 2 clusters")
    lut = {c: i for i, c in enumerate(classes)}
    codes = np.asarray([lut.get(l, -1) for l in labels], dtype=np.int32)
    out = _dbi_impl_masked(jnp.asarray(x), jnp.asarray(codes), _bucket_k(k))
    return out if lazy else float(out)


@partial(jax.jit, static_argnames=("n_clusters",))
def _ch_impl(x, codes, n_clusters: int):
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    mean = jnp.mean(x, axis=0)
    onehot = jax.nn.one_hot(codes, n_clusters, dtype=jnp.float32)
    counts = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)
    centroids = jnp.matmul(onehot.T, x, precision=jax.lax.Precision.HIGHEST) / counts[:, None]
    extra = jnp.sum(counts * jnp.sum((centroids - mean) ** 2, axis=1))
    assigned = centroids[codes]
    intra = jnp.sum((x - assigned) ** 2)
    return (extra / jnp.maximum(intra, 1e-30)) * (n - n_clusters) / (n_clusters - 1.0)


def calinski_harabasz(x, labels) -> float:
    codes = _as_codes(labels)
    k = int(codes.max()) + 1
    if k < 2:
        raise ValueError("calinski_harabasz requires >= 2 clusters")
    return float(_ch_impl(jnp.asarray(x), jnp.asarray(codes), k))
