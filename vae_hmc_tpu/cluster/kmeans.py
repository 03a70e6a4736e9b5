"""KMeans on device: greedy k-means++ init + Lloyd iterations as MXU matmuls,
with the n_init restarts vmapped into one program.

Replaces sklearn.cluster.KMeans as used throughout the reference (scripts
07:70, 09:87, 13:120, 16:183, 20:68, 22:91 — always n_init=20, seed 42).
The reference runs its 20 restarts serially in Cython; here all restarts run
as one vmapped XLA program whose inner products ride the MXU, and on a
multi-device mesh the restart axis shards (vae_hmc_tpu.parallel).

Algorithmic parity with sklearn (not bit-parity — RNG streams differ):
  - greedy k-means++ with n_local_trials = 2 + floor(log(k));
  - Lloyd updates; convergence on squared center-shift <= tol * mean
    per-feature variance of X (sklearn's _tolerance scaling);
  - empty clusters re-seeded at the points currently farthest from their
    assigned centers (same spirit as sklearn's largest-inertia relocation);
  - best-of-n_init by final inertia.
Tests check label agreement with sklearn via ARI and inertia ratio.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# bucket_k shared with metrics.internal — both layers must bucket
# identically for the program-count win to hold (advisor round 3)
from vae_hmc_tpu.core.bucketing import bucket_k as _bucket_k
from vae_hmc_tpu.core.config import KMeansConfig


@dataclass
class KMeansResult:
    labels: np.ndarray          # (N,) int32
    centers: np.ndarray         # (k, d)
    inertia: float
    n_iter: int


def _sq_dists_to_centers(x, centers):
    """(N, d) x (k, d) -> (N, k) squared distances (MXU path)."""
    xn = jnp.sum(x * x, axis=1)[:, None]
    cn = jnp.sum(centers * centers, axis=1)[None, :]
    return jnp.maximum(
        xn + cn - 2.0 * jnp.matmul(x, centers.T,
                                   precision=jax.lax.Precision.HIGHEST), 0.0)


def _kmeanspp_init(key, x, k, k_max: Optional[int] = None):
    """Greedy k-means++ (sklearn _kmeans_plusplus semantics).

    With k_max, `k` may be a TRACED value (dynamic-k program bucketing):
    the loop always runs k_max - 1 rounds, but rounds c >= k leave the
    carry untouched, so rows c >= k of the returned centers stay zero —
    callers must mask them out of assignment (_lloyd n_active).

    The dynamic program is BIT-IDENTICAL to the static one for EVERY
    k <= k_max, not just at the bucket boundary: candidate uniforms are
    drawn at the bucket's trial count but trials beyond sklearn's
    n_local_trials(k) = 2 + floor(ln k) are masked out of the argmin, and
    JAX's threefry uniforms have the prefix property (uniform(key, (L,))
    == uniform(key, (L_hi,))[:L]) — which holds ONLY under
    jax_threefry_partitionable=True, pinned at package import
    (vae_hmc_tpu/__init__.py) and asserted by kmeans()
    (tests/test_kmeans.py::test_dynamic_k_bit_identical_below_bucket).
    """
    static = k_max is None
    k_hi = int(k) if static else int(k_max)
    n = x.shape[0]
    n_local_trials = 2 + int(np.floor(np.log(k_hi)))
    if static:
        trial_mask = None
    else:
        # sklearn's count for the TRUE k; ln(k) is never an exact integer
        # for integer k > 1, so the f32 floor is safe
        lk = 2 + jnp.floor(jnp.log(jnp.asarray(k, jnp.float32))
                           ).astype(jnp.int32)
        trial_mask = jnp.arange(n_local_trials) < lk
    key, sub = jax.random.split(key)
    first = jax.random.randint(sub, (), 0, n)
    centers0 = jnp.zeros((k_hi, x.shape[1]), x.dtype).at[0].set(x[first])
    d2 = _sq_dists_to_centers(x, centers0[:1])[:, 0]            # (N,)

    def body(c, carry):
        centers, d2, key = carry
        key, sub = jax.random.split(key)
        pot = jnp.sum(d2)
        # sample n_local_trials candidate indices ~ d2 (Gumbel-free: inverse CDF)
        r = jax.random.uniform(sub, (n_local_trials,)) * pot
        cdf = jnp.cumsum(d2)
        cand = jnp.searchsorted(cdf, r)
        cand = jnp.clip(cand, 0, n - 1)
        cand_pts = x[cand]                                      # (L, d)
        cand_d2 = _sq_dists_to_centers(x, cand_pts)             # (N, L)
        new_d2 = jnp.minimum(d2[:, None], cand_d2)              # (N, L)
        pots = jnp.sum(new_d2, axis=0)                          # (L,)
        if trial_mask is not None:
            pots = jnp.where(trial_mask, pots, jnp.inf)
        best = jnp.argmin(pots)
        centers = centers.at[c].set(cand_pts[best])
        return centers, new_d2[:, best], key

    carry = (centers0, d2, key)
    for c in range(1, k_hi):                                    # k_hi is static & small
        if static:
            carry = body(c, carry)
        else:
            centers, nd2, nkey = body(c, carry)
            use = jnp.asarray(c) < k
            carry = (jnp.where(use, centers, carry[0]),
                     jnp.where(use, nd2, carry[1]), nkey)
    return carry[0]


def _lloyd(x, centers, max_iter: int, tol_scaled, n_active=None):
    """Lloyd iterations.  n_active (traced) masks center rows >= n_active
    out of assignment and relocation for the dynamic-k bucketed program;
    None means every row is live (static-k behavior, unchanged)."""
    k = centers.shape[0]
    active = None if n_active is None else (jnp.arange(k) < n_active)

    def assign(centers):
        d2 = _sq_dists_to_centers(x, centers)
        if active is not None:
            d2 = jnp.where(active[None, :], d2, jnp.inf)
        labels = jnp.argmin(d2, axis=1)
        return labels, d2

    def update(centers, labels, d2):
        onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)       # (N, k)
        counts = jnp.sum(onehot, axis=0)                        # (k,)
        sums = jnp.matmul(onehot.T, x,
                          precision=jax.lax.Precision.HIGHEST)  # (k, d)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        # empty-cluster relocation: farthest points from their centers —
        # reuses the (N, k) distances assign() just computed (the dominant
        # per-iteration matmul)
        d_own = jnp.min(d2, axis=1)
        order = jnp.argsort(-d_own)                             # farthest first
        empty = counts == 0
        if active is not None:
            empty = empty & active          # inactive rows stay zero
        empty_rank = jnp.cumsum(empty) - 1                      # rank among empties
        donor = x[order[jnp.clip(empty_rank, 0, x.shape[0] - 1)]]
        return jnp.where(empty[:, None], donor, new)

    def cond(state):
        _, shift2, it, done = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    def step(state):
        centers, _, it, _ = state
        labels, d2 = assign(centers)
        new_centers = update(centers, labels, d2)
        shift2 = jnp.sum((new_centers - centers) ** 2)
        return new_centers, shift2, it + 1, shift2 <= tol_scaled

    init = (centers, jnp.asarray(jnp.inf, x.dtype), jnp.asarray(0), jnp.asarray(False))
    centers, _, n_iter, _ = jax.lax.while_loop(cond, step, init)
    labels, d2 = assign(centers)
    inertia = jnp.sum(jnp.take_along_axis(d2, labels[:, None], axis=1))
    return labels, centers, inertia, n_iter


@partial(jax.jit, static_argnames=("k", "n_init", "max_iter"))
def _kmeans_impl(x, key, k: int, n_init: int, max_iter: int, tol: float):
    x = jnp.asarray(x, jnp.float32)
    tol_scaled = tol * jnp.mean(jnp.var(x, axis=0))
    keys = jax.random.split(key, n_init)

    def one_restart(kk):
        centers0 = _kmeanspp_init(kk, x, k)
        return _lloyd(x, centers0, max_iter, tol_scaled)

    labels, centers, inertias, n_iters = jax.vmap(one_restart)(keys)
    best = jnp.argmin(inertias)
    return labels[best], centers[best], inertias[best], n_iters[best]


@partial(jax.jit, static_argnames=("k_max", "n_init", "max_iter"))
def _kmeans_impl_dyn(x, key, k, k_max: int, n_init: int, max_iter: int,
                     tol: float):
    """Dynamic-k variant: k is TRACED, k_max static — one compiled program
    serves every k <= k_max (a sweep over k in {4..8} is 2 programs, k_max
    in {4, 8}, instead of 5; n_clusters was the bulk of the ~40 cold-start
    compiles measured in round 2).  Rows >= k of the centers are inert:
    zero, masked out of assignment, never relocated."""
    x = jnp.asarray(x, jnp.float32)
    tol_scaled = tol * jnp.mean(jnp.var(x, axis=0))
    keys = jax.random.split(key, n_init)

    def one_restart(kk):
        centers0 = _kmeanspp_init(kk, x, k, k_max)
        return _lloyd(x, centers0, max_iter, tol_scaled, n_active=k)

    labels, centers, inertias, n_iters = jax.vmap(one_restart)(keys)
    best = jnp.argmin(inertias)
    return labels[best], centers[best], inertias[best], n_iters[best]




def kmeans_dispatch(x, cfg: KMeansConfig = KMeansConfig(),
                    key: Optional[jax.Array] = None):
    """Dispatch the restart program; return the DEVICE result tuple
    (labels, centers, inertia, n_iter) without any host fetch.

    Callers that evaluate many cells (scripts 13/16 sweep the same
    representation at several k) dispatch every cell up front so the device
    works through the queue while the host computes metrics / ward linkage
    for earlier cells — the per-call blocking fetch otherwise serializes
    one device round-trip per cell (~0.5-1 s each on the tunneled dev
    chip).  Bit-identical to kmeans(): same program, same key derivation,
    only the fetch is deferred."""
    # dynamic-k bit-identity requires the threefry prefix property (see
    # _kmeanspp_init); the flag is pinned at package import — this guard
    # catches an entry point that flipped it back.  RuntimeError, not
    # assert: `python -O` strips asserts, and published clustering results
    # would silently move.
    if not jax.config.jax_threefry_partitionable:
        raise RuntimeError(
            "jax_threefry_partitionable must be True for dynamic-k kmeans "
            "bit-identity (pinned in vae_hmc_tpu/__init__.py)")
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    k = cfg.n_clusters
    k_max = _bucket_k(k)
    return _kmeans_impl_dyn(
        jnp.asarray(x), key, k, k_max, cfg.n_init, cfg.max_iter, cfg.tol)


def kmeans(x, cfg: KMeansConfig = KMeansConfig(),
           key: Optional[jax.Array] = None) -> KMeansResult:
    labels, centers, inertia, n_iter = jax.device_get(
        kmeans_dispatch(x, cfg, key))   # one bulk fetch, not 4 round-trips
    k = cfg.n_clusters
    return KMeansResult(
        labels=np.asarray(labels, dtype=np.int32),
        centers=np.asarray(centers)[:k],     # drop inert bucket-padding rows
        inertia=float(inertia),
        n_iter=int(n_iter),
    )


def kmeans_fit_predict(x, n_clusters: int, n_init: int = 20,
                       seed: int = 42) -> np.ndarray:
    return kmeans(x, KMeansConfig(n_clusters=n_clusters, n_init=n_init,
                                  seed=seed)).labels
