"""PCA via on-device SVD (sklearn.decomposition.PCA semantics).

Used for the PCA baselines (reference scripts/09:77-90, 22:128-134), the
pre-projection before UMAP/t-SNE (14:196-199) and t-SNE's pca init (08:120).
sklearn details reproduced: column centering, deterministic component signs
(svd_flip, Vt-based as in sklearn>=1.5: the largest-|loading| element of each component row is made positive),
explained-variance with ddof=1.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _svd_via_gram(xc):
    """Economy SVD of a wide centered matrix via its Gram matrix:
    xc = U S Vt with G = xc xc^T = U S^2 U^T."""
    g = jnp.matmul(xc, xc.T, precision=jax.lax.Precision.HIGHEST)
    vals, u = jnp.linalg.eigh(g)                     # ascending
    vals, u = vals[::-1], u[:, ::-1]
    s = jnp.sqrt(jnp.maximum(vals, 0.0))
    vt = (jnp.matmul(u.T, xc, precision=jax.lax.Precision.HIGHEST)
          / jnp.maximum(s, 1e-12)[:, None])
    return u, s, vt


@dataclass
class PCA:
    n_components: int
    mean_: Optional[np.ndarray] = None
    components_: Optional[np.ndarray] = None          # (k, d)
    explained_variance_: Optional[np.ndarray] = None
    explained_variance_ratio_: Optional[np.ndarray] = None

    def fit(self, x) -> "PCA":
        x = jnp.asarray(x, dtype=jnp.float32)
        n, d = x.shape
        mean = jnp.mean(x, axis=0)
        xc = x - mean
        if d > 2 * n:
            # Gram trick: for wide data (the 82k-dim mel-flat rep) the SVD
            # of xc factors through eigh of the (n, n) Gram matrix — one MXU
            # matmul + a small eigh instead of an O(n^2 d) SVD sweep.
            # Identical components up to f32 roundoff (tested vs sklearn).
            u, s, vt = _svd_via_gram(xc)
        else:
            # full_matrices=False: U (n,k'), s (k',), Vt (k', d)
            u, s, vt = jnp.linalg.svd(xc, full_matrices=False)
        # svd_flip, Vt-based (sklearn>=1.5 PCA convention,
        # u_based_decision=False): the max-|loading| entry of each component
        # row is made positive
        max_idx = jnp.argmax(jnp.abs(vt), axis=1)
        signs = jnp.sign(vt[jnp.arange(vt.shape[0]), max_idx])
        vt = vt * signs[:, None]
        var = (s ** 2) / (n - 1)
        total_var = jnp.sum(jnp.var(xc, axis=0, ddof=1))
        k = self.n_components
        self.mean_ = np.asarray(mean)
        self.components_ = np.asarray(vt[:k])
        self.explained_variance_ = np.asarray(var[:k])
        self.explained_variance_ratio_ = np.asarray(var[:k] / total_var)
        return self

    def transform(self, x) -> jnp.ndarray:
        x = jnp.asarray(x, dtype=jnp.float32)
        return (x - jnp.asarray(self.mean_)) @ jnp.asarray(self.components_).T

    def fit_transform(self, x) -> jnp.ndarray:
        return self.fit(x).transform(x)


def pca_project(x, n_components: int) -> np.ndarray:
    """One-shot helper; returns host array."""
    return np.asarray(PCA(n_components).fit_transform(x))
