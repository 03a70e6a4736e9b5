"""Exact t-SNE as one jitted XLA program.

The reference uses sklearn's Barnes-Hut t-SNE on host (scripts 08:118-120:
perplexity 30, lr 200, 1500 iters, init='pca').  At N~3k an *exact* O(N^2)
t-SNE is a better fit for the TPU: the (N, N) affinity and gradient
computations are dense matmul/reduction work that rides the MXU, and the
whole optimization is a lax.fori_loop inside a single compiled program —
no per-iteration host round trips.

Implements standard t-SNE (van der Maaten & Hinton 2008): binary-searched
per-point precisions to hit the perplexity target, symmetrized P, early
exaggeration x12 for the first 250 iterations, momentum 0.5 -> 0.8, adaptive
gains — matching sklearn's schedule; output geometry is equivalent in
distribution, not point-identical (different RNG/optimizer details).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vae_hmc_tpu.core.config import TsneConfig
from vae_hmc_tpu.metrics.internal import pairwise_sq_dists
from vae_hmc_tpu.ops.pca import PCA

_EPS = 1e-12


def _binary_search_perplexity(d2: jax.Array, perplexity: float,
                              n_steps: int = 50) -> jax.Array:
    """Per-row precision beta s.t. entropy(P_row) == log(perplexity)."""
    n = d2.shape[0]
    target = jnp.log(perplexity)
    eye = jnp.eye(n, dtype=bool)

    def entropy_and_p(beta):
        logits = -d2 * beta[:, None]
        logits = jnp.where(eye, -jnp.inf, logits)
        p = jax.nn.softmax(logits, axis=1)
        # H = -sum p log p
        h = -jnp.sum(jnp.where(p > 0, p * jnp.log(p + _EPS), 0.0), axis=1)
        return h, p

    def body(_, carry):
        beta, lo, hi = carry
        h, _ = entropy_and_p(beta)
        too_high = h > target          # entropy too high -> increase beta
        lo = jnp.where(too_high, beta, lo)
        hi = jnp.where(too_high, hi, beta)
        beta = jnp.where(jnp.isinf(hi), beta * 2.0,
                         jnp.where(jnp.isinf(lo), beta / 2.0,
                                   0.5 * (lo + hi)))
        # note: lo starts at -inf? use 0 as lower bound (beta > 0)
        return beta, lo, hi

    beta0 = jnp.ones(n)
    lo0 = jnp.zeros(n)
    hi0 = jnp.full(n, jnp.inf)
    beta, _, _ = jax.lax.fori_loop(0, n_steps, body, (beta0, lo0, hi0))
    _, p = entropy_and_p(beta)
    return p


@partial(jax.jit, static_argnames=("n_iter", "early_iter"))
def _tsne_optimize(p_cond, y0, learning_rate: float, n_iter: int,
                   early_iter: int = 250, early_exaggeration: float = 12.0):
    n = p_cond.shape[0]
    p = (p_cond + p_cond.T) / (2.0 * n)
    p = jnp.maximum(p, _EPS)
    eye = jnp.eye(n, dtype=bool)

    def grad(y, pmat):
        d2 = pairwise_sq_dists(y)
        num = 1.0 / (1.0 + d2)
        num = jnp.where(eye, 0.0, num)
        q = jnp.maximum(num / jnp.sum(num), _EPS)
        pq = (pmat - q) * num                              # (N, N)
        g = 4.0 * (jnp.diag(jnp.sum(pq, axis=1)) - pq) @ y  # (N, 2)
        return g

    def step(i, state):
        y, vel, gains = state
        pmat = jnp.where(i < early_iter, p * early_exaggeration, p)
        momentum = jnp.where(i < early_iter, 0.5, 0.8)
        g = grad(y, pmat)
        same_sign = jnp.sign(g) == jnp.sign(vel)
        gains = jnp.maximum(
            jnp.where(same_sign, gains * 0.8, gains + 0.2), 0.01)
        vel = momentum * vel - learning_rate * gains * g
        y = y + vel
        y = y - jnp.mean(y, axis=0, keepdims=True)
        return y, vel, gains

    y, _, _ = jax.lax.fori_loop(
        0, n_iter, step,
        (y0, jnp.zeros_like(y0), jnp.ones_like(y0)))
    return y


def tsne(x: np.ndarray, cfg: TsneConfig = TsneConfig()) -> np.ndarray:
    """(N, d) -> (N, 2) embedding."""
    # device inputs stay on device: every heavy step (pairwise distances,
    # PCA init, the optimize loop) is a device program, so a host conversion
    # here would be a pure readback tax (966 MB for the mel-flat rep)
    x = x if isinstance(x, jax.Array) else np.asarray(x, dtype=np.float32)
    n = int(x.shape[0])
    perplexity = min(cfg.perplexity, max(2.0, (n - 1) / 3.0))
    d2 = pairwise_sq_dists(jnp.asarray(x))
    p_cond = _binary_search_perplexity(d2, perplexity)
    if cfg.init == "pca" and x.shape[1] >= 2:
        y0 = np.asarray(PCA(2).fit_transform(x))
        y0 = y0 / (y0[:, 0].std() + 1e-12) * 1e-4           # sklearn scaling
    else:
        rng = np.random.default_rng(cfg.seed)
        y0 = (rng.standard_normal((n, 2)) * 1e-4)
    y = _tsne_optimize(p_cond, jnp.asarray(y0, jnp.float32),
                       cfg.learning_rate, cfg.n_iter)
    return np.asarray(y)
