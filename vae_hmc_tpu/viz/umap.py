"""First-party UMAP, on device, as a handful of jitted XLA programs.

The reference treats umap-learn as an optional host dependency and silently
falls back to t-SNE when it's missing (scripts 08:14-18, 14:13-25,
21:13-17).  This module removes the dependency entirely: the full UMAP
pipeline (McInnes, Healy & Melville 2018) implemented TPU-first —

  1. exact kNN from one (N, N) device distance matmul + top_k;
  2. fuzzy simplicial set: rho = nearest-neighbor distance, per-point sigma
     binary-searched so sum_j exp(-(d_ij - rho_i)+ / sigma_i) = log2(k),
     symmetrized by fuzzy union W + Wt - W*Wt — computed EDGE-WISE on the
     (i, knn(i)) pairs (_edge_weights); the dense-W scatter build exists
     only for the small-graph API (fuzzy_simplicial_set) because every TPU
     scatter formulation of it compiles to ~7 MB of code at N=3k that each
     fresh process re-loads through the device service (round-3 finding);
  3. spectral initialization: leading nontrivial eigenvectors of the
     normalized graph Laplacian via deflated block-subspace iteration with
     SPARSE matvecs (gather + segment-sum over the edge list) — dense eigh
     unrolls to ~183 MB executables at N~3k (the round-2 finding), and the
     dense-W subspace path still pays the scatter build above;
  4. SGD with negative sampling: per-epoch vectorized pass over all graph
     edges using umap-learn's epoch_of_next_sample scheduling, attractive
     gradient -2ab d^(2(b-1)) / (1 + a d^(2b)) on both endpoints,
     `negative_sample_rate` uniform negatives repelling the head, per-dim
     gradient clipping at +-4, linearly decaying learning rate — one
     lax.fori_loop inside a single compiled program (umap-learn runs this
     loop per-edge in numba on host).

Deviations from umap-learn (documented, visualization-only artifact):
updates within an epoch are applied as a summed scatter instead of
sequential in-place writes, and the RNG stream differs — embeddings are
equivalent in structure (tested via trustworthiness and label separation),
not point-identical.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vae_hmc_tpu.metrics.internal import pairwise_sq_dists

_SMOOTH_K_TOL = 1e-5


def find_ab_params(spread: float = 1.0, min_dist: float = 0.1):
    """Least-squares fit of 1/(1 + a d^{2b}) to the fuzzy membership target
    curve (umap-learn's find_ab_params, Gauss-Newton instead of scipy)."""
    d = np.linspace(0.0, spread * 3.0, 300, dtype=np.float64)
    target = np.where(d <= min_dist, 1.0,
                      np.exp(-(d - min_dist) / spread))
    a, b = 1.5, 1.0
    for _ in range(200):
        da = d ** (2.0 * b)
        f = 1.0 / (1.0 + a * da)
        r = f - target
        # jacobian of f wrt (a, b)
        denom2 = (1.0 + a * da) ** 2
        with np.errstate(divide="ignore", invalid="ignore"):
            dfda = -da / denom2
            dfdb = np.where(d > 0, -2.0 * a * da * np.log(d ** 2) / denom2,
                            0.0)
        J = np.stack([dfda, dfdb], axis=1)
        g = J.T @ r
        H = J.T @ J + 1e-8 * np.eye(2)
        step = np.linalg.solve(H, g)
        a, b = a - step[0], b - step[1]
    return float(a), float(b)


@partial(jax.jit, static_argnames=("k",))
def _knn(x, k: int):
    d = jnp.sqrt(pairwise_sq_dists(x))
    # mask the diagonal with where(eye), NOT a .at[arange, arange].set:
    # the 2-D-index scatter lowers to ~5 MB of TPU code at N=3k and this
    # program is re-loaded through the tunnel by every fresh process
    # (measured: 0.10 MB this way — tools/profile_viz_programs.py)
    eye = jnp.eye(d.shape[0], dtype=bool)
    d = jnp.where(eye, jnp.inf, d)
    neg_d, idx = jax.lax.top_k(-d, k)
    return -neg_d, idx                    # (N, k) ascending distances


@partial(jax.jit, static_argnames=("n_iter",))
def _smooth_knn(knn_d, n_iter: int = 64):
    """Per-point (rho, sigma): umap-learn's smooth_knn_dist binary search."""
    k = knn_d.shape[1]
    target = jnp.log2(k)
    rho = knn_d[:, 0]
    adj = jnp.maximum(knn_d - rho[:, None], 0.0)

    def psum(sigma):
        return jnp.sum(jnp.exp(-adj / sigma[:, None]), axis=1)

    lo = jnp.zeros(knn_d.shape[0])
    hi = jnp.full(knn_d.shape[0], jnp.inf)
    mid = jnp.ones(knn_d.shape[0])

    def body(_, carry):
        lo, hi, mid = carry
        val = psum(mid)
        too_high = val > target
        hi = jnp.where(too_high, mid, hi)
        lo = jnp.where(too_high, lo, mid)
        mid = jnp.where(too_high, (lo + hi) / 2.0,
                        jnp.where(jnp.isinf(hi), mid * 2.0, (lo + hi) / 2.0))
        return lo, hi, mid

    _, _, sigma = jax.lax.fori_loop(0, n_iter, body, (lo, hi, mid))
    # umap floors sigma at MIN_K_DIST_SCALE * mean distance
    mean_d = jnp.mean(knn_d)
    sigma = jnp.maximum(sigma, 1e-3 * mean_d)
    return rho, sigma


def fuzzy_simplicial_set(x: jax.Array, n_neighbors: int):
    """-> dense (N, N) symmetrized membership matrix W."""
    knn_d, knn_i = _knn(x, n_neighbors)
    rho, sigma = _smooth_knn(knn_d)
    return _build_w(knn_d, knn_i, rho, sigma)


@jax.jit
def _build_w(knn_d, knn_i, rho, sigma):
    n = knn_d.shape[0]
    w = jnp.exp(-jnp.maximum(knn_d - rho[:, None], 0.0)
                / sigma[:, None])
    W = jnp.zeros((n, n), jnp.float32)
    rows = jnp.repeat(jnp.arange(n), knn_d.shape[1])
    W = W.at[rows, knn_i.reshape(-1)].set(w.reshape(-1))
    return W + W.T - W * W.T          # fuzzy union


@jax.jit
def _edge_list(Wsym, knn_i):
    """Fixed-shape directed edge list covering every nonzero of Wsym.

    The nonzeros of the fuzzy union live exactly on (i, knn(i)) pairs and
    their transposes, so 2*N*k (head, tail, weight) triplets cover the
    graph with STATIC shapes — no host nonzero() (which costs a ~34 MB
    device fetch of the dense W at N=3k on this tunnel) and no
    per-input-recompilation of the optimizer program.  Mutual-kNN pairs
    would appear twice in the same direction (once direct from the head,
    once as the reverse of the tail's own direct edge); the reverse copy is
    weight-zeroed so each directed edge is counted exactly once, matching
    the CSR walk of the symmetric matrix in umap-learn.
    """
    n, k = knn_i.shape
    rows = jnp.repeat(jnp.arange(n), k)                   # (N*k,)
    cols = knn_i.reshape(-1)
    w_dir = Wsym[rows, cols]
    # mutual[i*k+j]: is i itself in knn(knn_i[i, j])?
    back = knn_i[knn_i]                                   # (N, k, k)
    mutual = jnp.any(back == jnp.arange(n)[:, None, None],
                     axis=-1).reshape(-1)
    w_rev = jnp.where(mutual, 0.0, w_dir)
    heads = jnp.concatenate([rows, cols])
    tails = jnp.concatenate([cols, rows])
    weights = jnp.concatenate([w_dir, w_rev])
    return heads, tails, weights


@jax.jit
def _edge_weights(knn_d, knn_i, rho, sigma):
    """Fuzzy-union edge list straight from the kNN arrays — no dense (N, N)
    intermediate.

    Every TPU scatter that builds the dense W compiles to ~7 MB of code at
    N=3k (measured across .at[] / segment_sum / vmapped-row formulations),
    and each fresh process re-pays that executable's transfer through the
    device service.  The union only ever has mass on (i, knn(i)) pairs, so
    it is computed edge-wise instead:

      W[i,c]   = w[i,j]                      (i's own membership row)
      W[c,i]   = w[c,j'] where knn(c)[j']==i (0 when i is not in knn(c))
      W_sym    = W[i,c] + W[c,i] - W[i,c]*W[c,i]

    Output layout is IDENTICAL to _edge_list(_build_w(...)): direct edges
    first, reverse copies second with mutual pairs weight-zeroed so each
    directed edge carries mass exactly once
    (tests/test_umap.py::test_edge_weights_match_dense_path)."""
    n, k = knn_i.shape
    w = jnp.exp(-jnp.maximum(knn_d - rho[:, None], 0.0) / sigma[:, None])
    rows = jnp.repeat(jnp.arange(n), k)
    cols = knn_i.reshape(-1)                  # (N*k,)
    w_ic = w.reshape(-1)
    kic = knn_i[cols]                         # (N*k, k) 1-D row gathers:
    wc = w[cols]                              # small code, unlike scatters
    hit = kic == rows[:, None]
    w_ci = jnp.sum(jnp.where(hit, wc, 0.0), axis=1)
    mutual = jnp.any(hit, axis=1)
    w_dir = w_ic + w_ci - w_ic * w_ci         # fuzzy union, = W_sym[i, c]
    w_rev = jnp.where(mutual, 0.0, w_dir)
    heads = jnp.concatenate([rows, cols])
    tails = jnp.concatenate([cols, rows])
    weights = jnp.concatenate([w_dir, w_rev])
    return heads, tails, weights


@partial(jax.jit, static_argnames=("n", "n_iter", "oversample"))
def _spectral_init_sparse(heads, tails, weights, n: int, n_iter: int = 150,
                          oversample: int = 8):
    """Spectral init from the edge list: identical operator to
    _spectral_init (deflated top-2 of 2I - L = I + D^{-1/2} W D^{-1/2}) but
    every A·V is a gather + segment-sum over edges instead of a dense
    (N, N) matmul — program size is O(1) in BOTH n and the dense-W scatter
    it replaces, and the edge formulation is the one that scales past the
    point where a dense W fits HBM."""
    from vae_hmc_tpu.ops.subspace import _HI, _loewdin

    deg = jnp.maximum(
        jax.ops.segment_sum(weights, heads, num_segments=n), 1e-8)
    inv_sqrt = 1.0 / jnp.sqrt(deg)
    u0 = jnp.sqrt(deg)
    u0 = u0 / jnp.maximum(jnp.linalg.norm(u0), 1e-30)
    wcol = weights[:, None]

    def matvec(v):                            # (I + S) v, S = D^-1/2 W D^-1/2
        u = inv_sqrt[:, None] * v
        s = jax.ops.segment_sum(wcol * u[tails], heads, num_segments=n)
        return v + inv_sqrt[:, None] * s

    def deflate(z):
        return z - jnp.outer(u0, jnp.matmul(u0, z, precision=_HI))

    m = min(n - 1, 2 + oversample)
    q = jax.random.normal(jax.random.PRNGKey(0), (n, m), jnp.float32)

    def body(_, q):
        return _loewdin(deflate(matvec(q)))

    q = jax.lax.fori_loop(0, n_iter, body, _loewdin(deflate(q)))
    t = jnp.matmul(q.T, matvec(q), precision=_HI)
    _, v = jnp.linalg.eigh(t)                 # ascending
    y0 = jnp.matmul(q, v[:, ::-1][:, :2], precision=_HI)
    scale = 10.0 / jnp.maximum(jnp.max(jnp.abs(y0)), 1e-8)
    return y0 * scale


@jax.jit
def _spectral_init(W):
    """Leading nontrivial eigenvectors of the normalized Laplacian, scaled
    to the +-10 box umap-learn uses.

    Small graphs use the dense eigh directly; past 512 nodes the TPU eigh
    lowering's executable grows pathologically (~183 MB of TPU code at
    n=2924 — see ops/subspace.py), so the bottom nontrivial eigenvectors
    are computed as the DEFLATED top eigenvectors of the shifted operator
    A = 2I - L = I + D^{-1/2} W D^{-1/2} (PSD, spectrum in [0, 2]), with
    the known trivial eigenvector D^{1/2}·1 projected out each step."""
    n = W.shape[0]
    d = jnp.maximum(jnp.sum(W, axis=1), 1e-8)
    inv_sqrt = 1.0 / jnp.sqrt(d)
    S = inv_sqrt[:, None] * W * inv_sqrt[None, :]
    if n <= 512:
        vals, vecs = jnp.linalg.eigh(jnp.eye(n) - S)
        y0 = vecs[:, 1:3]
    else:
        from vae_hmc_tpu.ops.subspace import topk_eigh_deflated
        _, y0 = topk_eigh_deflated(S + jnp.eye(n), jnp.sqrt(d), 2)
    scale = 10.0 / jnp.maximum(jnp.max(jnp.abs(y0)), 1e-8)
    return y0 * scale


@partial(jax.jit, static_argnames=("n_epochs", "neg_rate"))
def _optimize(y0, heads, tails, eps_per_sample, key, a, b,
              n_epochs: int, neg_rate: int, lr: float):
    """Epoch-batched negative-sampling SGD.

    Layout invariant (from _edge_weights/_edge_list, asserted by shape):
    heads = [rows; cols], tails = [cols; rows] with
    rows = repeat(arange(N), k) — i.e. the first E/2 edges are grouped
    contiguously by head node.  That structure turns 2 of the 3 per-epoch
    scatter-adds into reshape-sums (a (N, k, 2) reduction costs neither
    scatter code nor scatter sort time on TPU), and the two remaining
    col-indexed scatters merge into ONE (round 5: the 3x (2Nk, 2)
    scatter-adds dominated the 500-epoch loop at ~16 ms/epoch on v5e;
    measured ~2.6x faster after).

    Batching note: umap-learn applies edge updates sequentially inside an
    epoch; this kernel (like round 4's) batches the whole epoch, and the
    negative forces read the epoch's STARTING positions rather than the
    post-attraction ones.  Both are epoch-level approximations of the same
    descent; quality is pinned by trustworthiness/cluster-recovery gates
    (tests/test_umap.py), not bit-equality to umap-learn."""
    n = y0.shape[0]
    e = heads.shape[0]
    e2 = e // 2
    k = e2 // n
    assert e2 * 2 == e and k * n == e2, (
        "heads/tails must be the [direct; reverse] kNN-edge layout")
    cols = tails[:e2]                       # == heads[e2:]

    def epoch_body(epoch, carry):
        y, eons, key = carry
        alpha = lr * (1.0 - epoch / n_epochs)
        active = eons <= epoch
        yh, yt = y[heads], y[tails]
        diff = yh - yt
        d2 = jnp.sum(diff * diff, axis=1)
        # attraction: both endpoints move (umap move_other=True)
        grad_coeff = jnp.where(
            d2 > 0.0,
            (-2.0 * a * b * d2 ** (b - 1.0)) / (a * d2 ** b + 1.0),
            0.0)
        g = jnp.clip(grad_coeff[:, None] * diff, -4.0, 4.0)
        g = jnp.where(active[:, None], g, 0.0)
        # negative sampling: neg_rate uniform points repel each active head.
        # One (E, R) fancy gather compiles to ~18 MB of TPU code (the
        # reshape fuses into the gather); R separate 1-D row gathers,
        # summed as we go, compile to ~1 MB and are the same math in the
        # same accumulation order as jnp.sum(..., axis=1) over r=0..R-1.
        key, sub = jax.random.split(key)
        negs = jax.random.randint(sub, (e, neg_rate), 0, n)
        gn_sum = jnp.zeros_like(yh)                     # (E, 2)
        for r in range(neg_rate):
            diff_n = yh - y[negs[:, r]]                 # (E, 2)
            d2n = jnp.sum(diff_n * diff_n, axis=1)
            coeff_n = (2.0 * b) / ((0.001 + d2n) * (a * d2n ** b + 1.0))
            gn = jnp.clip(coeff_n[:, None] * diff_n, -4.0, 4.0)
            gn = jnp.where(d2n[:, None] > 0.0, gn, 4.0)  # umap: stuck pairs
            gn_sum = gn_sum + gn
        gn_sum = jnp.where(active[:, None], gn_sum, 0.0)
        u = alpha * (g + gn_sum)            # total update at heads
        v = -alpha * g                      # total update at tails
        # heads = [rows; cols], tails = [cols; rows]: the row-indexed halves
        # (u[:e2] at rows, v[e2:] at rows) are contiguous k-groups — a
        # reshape-sum, not a scatter; the col-indexed halves merge into ONE
        # scatter-add (was three (2Nk, 2) scatters per epoch).
        y = y + (u[:e2] + v[e2:]).reshape(n, k, 2).sum(axis=1)
        y = y.at[cols].add(u[e2:] + v[:e2])
        eons = jnp.where(active, eons + eps_per_sample, eons)
        return y, eons, key

    y, _, _ = jax.lax.fori_loop(0, n_epochs, epoch_body,
                                (y0, eps_per_sample.copy(), key))
    return y


def _umap_chain(d, key, a, b, n_neighbors: int, n_epochs: int,
                neg_rate: int, lr):
    """Full UMAP chain from a (N, N) euclidean distance matrix, traceable.

    kNN -> smooth-knn (rho, sigma) -> edge-wise fuzzy union -> epoch
    scheduling -> sparse spectral init -> negative-sampling SGD, all inside
    ONE compiled program.  Round 4: the per-stage jits cost ~6 dispatches
    per embedding (~0.5-1 s each under tunnel congestion); fusing the chain
    makes every UMAP call a single dispatch, and distance-matrix inputs let
    the medium tier reuse the sweep's cached per-representation distances
    instead of recomputing them."""
    n = d.shape[0]
    eye = jnp.eye(n, dtype=bool)
    dm = jnp.where(eye, jnp.inf, d)
    neg_d, knn_i = jax.lax.top_k(-dm, n_neighbors)
    knn_d = -neg_d
    rho, sigma = _smooth_knn(knn_d)
    heads, tails, weights = _edge_weights(knn_d, knn_i, rho, sigma)
    eps_per_sample = _eps_per_sample(weights, n_epochs)
    y0 = _spectral_init_sparse(heads, tails, weights, n)
    # small init jitter (umap adds 1e-4-scale noise to spectral init)
    y0 = y0 + 1e-4 * jax.random.normal(key, y0.shape)
    return _optimize(y0.astype(jnp.float32), heads, tails, eps_per_sample,
                     key, a, b, n_epochs=n_epochs, neg_rate=neg_rate, lr=lr)


@partial(jax.jit,
         static_argnames=("n_neighbors", "n_epochs", "neg_rate"))
def _umap_from_x_impl(x, key, a, b, n_neighbors: int, n_epochs: int,
                      neg_rate: int, lr):
    return _umap_chain(jnp.sqrt(pairwise_sq_dists(x)), key, a, b,
                       n_neighbors, n_epochs, neg_rate, lr)


@partial(jax.jit,
         static_argnames=("n_neighbors", "n_epochs", "neg_rate"))
def _umap_from_dists_impl(d, key, a, b, n_neighbors: int, n_epochs: int,
                          neg_rate: int, lr):
    return _umap_chain(d, key, a, b, n_neighbors, n_epochs, neg_rate, lr)


@partial(jax.jit,
         static_argnames=("n_neighbors", "n_epochs", "neg_rate"))
def _umap_batch_impl(ds, key, a, b, n_neighbors: int, n_epochs: int,
                     neg_rate: int, lr):
    """(B, N, N) distances -> (B, N, 2): every embedding in ONE program.
    The key is shared across batch elements — identical to B separate
    umap_2d calls with the same seed.

    lax.scan over the batch, NOT vmap: vmapping the chain turns its 1-D
    edge scatters/gathers into multi-dim-index forms that hit the TPU
    scatter slow path AND the code-size hazard — measured at (3, 2924,
    2924): vmap 8.0 s exec / 3.9 MB executable vs scan ~3x the 1.4 s
    single-rep exec with the single-rep program body (round 5)."""
    def step(_, d):
        return None, _umap_chain(d, key, a, b, n_neighbors,
                                 n_epochs, neg_rate, lr)
    _, ys = jax.lax.scan(step, None, ds)
    return ys


def _umap_params(n: int, n_neighbors: int, n_epochs: int):
    n_neighbors = min(n_neighbors, n - 1)
    if n_epochs <= 0:
        n_epochs = 500 if n <= 10000 else 200    # umap-learn default
    return n_neighbors, int(n_epochs)


def umap_2d(x, n_neighbors: int = 15, min_dist: float = 0.1,
            n_epochs: int = 0, negative_sample_rate: int = 5,
            learning_rate: float = 1.0, seed: int = 42) -> np.ndarray:
    """(N, d) -> (N, 2) UMAP embedding, fully on device, ONE dispatch."""
    x = jnp.asarray(x, jnp.float32)
    n_neighbors, n_epochs = _umap_params(int(x.shape[0]), n_neighbors,
                                         n_epochs)
    a, b = find_ab_params(1.0, min_dist)
    y = _umap_from_x_impl(x, jax.random.PRNGKey(seed), a, b,
                          n_neighbors=n_neighbors, n_epochs=n_epochs,
                          neg_rate=int(negative_sample_rate),
                          lr=float(learning_rate))
    return np.asarray(y, dtype=np.float32)


def umap_2d_from_dists(d, n_neighbors: int = 15, min_dist: float = 0.1,
                       n_epochs: int = 0, negative_sample_rate: int = 5,
                       learning_rate: float = 1.0,
                       seed: int = 42) -> np.ndarray:
    """(N, N) euclidean distances -> (N, 2).  Same chain as umap_2d from
    the kNN stage on; distances may come from any source (the medium tier
    passes the sweep's cached centered device distance matrix — identical
    distances up to f32 rounding, and the O(N^2 d) matmul is free)."""
    d = jnp.asarray(d, jnp.float32)
    n_neighbors, n_epochs = _umap_params(int(d.shape[0]), n_neighbors,
                                         n_epochs)
    a, b = find_ab_params(1.0, min_dist)
    y = _umap_from_dists_impl(d, jax.random.PRNGKey(seed), a, b,
                              n_neighbors=n_neighbors, n_epochs=n_epochs,
                              neg_rate=int(negative_sample_rate),
                              lr=float(learning_rate))
    return np.asarray(y, dtype=np.float32)


def umap_2d_from_dists_batch(ds, n_neighbors: int = 15,
                             min_dist: float = 0.1, n_epochs: int = 0,
                             negative_sample_rate: int = 5,
                             learning_rate: float = 1.0,
                             seed: int = 42) -> np.ndarray:
    """(B, N, N) distance matrices -> (B, N, 2) in ONE device program +
    ONE host fetch (the side-by-side figure embeds 3 representations; the
    per-call path costs ~2 dispatches each)."""
    ds = (jnp.stack([jnp.asarray(d, jnp.float32) for d in ds])
          if isinstance(ds, (list, tuple)) else jnp.asarray(ds, jnp.float32))
    n_neighbors, n_epochs = _umap_params(int(ds.shape[1]), n_neighbors,
                                         n_epochs)
    a, b = find_ab_params(1.0, min_dist)
    y = _umap_batch_impl(ds, jax.random.PRNGKey(seed), a, b,
                         n_neighbors=n_neighbors, n_epochs=n_epochs,
                         neg_rate=int(negative_sample_rate),
                         lr=float(learning_rate))
    return np.asarray(y, dtype=np.float32)


@partial(jax.jit, static_argnames=("n_epochs",))
def _eps_per_sample(weights, n_epochs: int):
    """umap make_epochs_per_sample: edges too weak to be sampled even once
    (w < w_max/n_epochs, incl. the deduped zero-weight copies) never fire —
    +inf keeps them permanently inactive in the optimizer."""
    w_max = jnp.max(weights)
    active = weights >= w_max / n_epochs
    return jnp.where(active, w_max / jnp.maximum(weights, 1e-30), jnp.inf)
