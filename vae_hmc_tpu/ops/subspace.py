"""Top-k symmetric eigensolver via block subspace iteration (TPU-native).

XLA's dense ``eigh``/``svd`` lowerings on TPU unroll their QR/Jacobi sweeps,
so executable CODE SIZE grows with the operand: an eigh of a (2924, 2924)
operand compiles to a ~183 MB TPU executable (measured in this repo's
persistent cache; ~138 s to compile on a 1-core host, and every fresh
process pays the executable transfer again).  For the spectral problems in
this framework — PCA projections (reference scripts 09/14/22) and UMAP
spectral initialization (script 08's umap path) — only the top *k* (k <= ~50)
eigenpairs are needed, so the TPU-native formulation is block subspace
iteration: a ``fori_loop`` over one (n, n) x (n, m) MXU matmul per step with
a tiny (m, m) Löwdin orthonormalization, followed by an (m, m)
Rayleigh–Ritz eigh.  Program size is O(1) in n (~KBs), compile is ~1 s, and
the per-step matmul tiles straight onto the MXU.

Accuracy: subspace iteration converges linearly at rate (lam_{m+1}/lam_k)
per step; with the default oversampling (8) and 150 steps it reaches f32
roundoff on spectra with any reasonable decay (tested against numpy.eigh
in tests/test_core.py).  All accumulations run at ``Precision.HIGHEST``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _loewdin(z):
    """Symmetric (Löwdin) orthonormalization of the (n, m) block: only an
    (m, m) eigh — no tall-skinny QR, whose TPU lowering also unrolls.

    The eigenvalue floor is RELATIVE to the largest: once the block starts
    converging, the Gram matrix is rank-deficient at f32 and its trailing
    eigenvalues come out slightly NEGATIVE with magnitude ~eps * w_max —
    an absolute floor turns those into 1/sqrt(tiny) blowups (observed NaN
    by iteration 2 on a rank-8 + noise covariance)."""
    g = jnp.matmul(z.T, z, precision=_HI)
    w, v = jnp.linalg.eigh(g)
    floor = jnp.maximum(w[-1], 1e-30) * 1e-6         # w ascending: w[-1] max
    inv_sqrt = jnp.matmul(v / jnp.sqrt(jnp.maximum(w, floor))[None, :], v.T,
                          precision=_HI)
    return jnp.matmul(z, inv_sqrt, precision=_HI)


@partial(jax.jit, static_argnames=("k", "n_iter", "oversample", "seed"))
def topk_eigh(a, k: int, n_iter: int = 150, oversample: int = 8,
              seed: int = 0):
    """Top-k eigenpairs (descending) of a symmetric PSD (n, n) matrix.

    Returns ``(vals (k,), vecs (n, k))``; eigenvector signs are arbitrary
    (callers needing a deterministic sign apply their own convention, e.g.
    PCA's svd_flip).
    """
    n = a.shape[0]
    m = min(n, k + oversample)
    q = jax.random.normal(jax.random.PRNGKey(seed), (n, m), a.dtype)

    def body(_, q):
        return _loewdin(jnp.matmul(a, q, precision=_HI))

    q = jax.lax.fori_loop(0, n_iter, body, _loewdin(q))
    # Rayleigh–Ritz on the converged block
    aq = jnp.matmul(a, q, precision=_HI)
    t = jnp.matmul(q.T, aq, precision=_HI)
    w, v = jnp.linalg.eigh(t)                        # ascending
    w, v = w[::-1][:k], v[:, ::-1][:, :k]
    return w, jnp.matmul(q, v, precision=_HI)


@partial(jax.jit, static_argnames=("k", "n_iter", "oversample", "seed"))
def topk_eigh_deflated(a, u0, k: int, n_iter: int = 150, oversample: int = 8,
                       seed: int = 0):
    """Top-k eigenpairs of symmetric PSD ``a`` restricted to the complement
    of the known unit eigenvector ``u0`` (n,) — i.e. ``u0`` is projected out
    of the iterate every step.  Used for the UMAP spectral init, where the
    normalized Laplacian's trivial eigenvector D^{1/2}·1 is known exactly."""
    n = a.shape[0]
    m = min(n - 1, k + oversample)
    u0 = u0 / jnp.maximum(jnp.linalg.norm(u0), 1e-30)

    def deflate(z):
        return z - jnp.outer(u0, jnp.matmul(u0, z, precision=_HI))

    q = jax.random.normal(jax.random.PRNGKey(seed), (n, m), a.dtype)

    def body(_, q):
        return _loewdin(deflate(jnp.matmul(a, q, precision=_HI)))

    q = jax.lax.fori_loop(0, n_iter, body, _loewdin(deflate(q)))
    aq = jnp.matmul(a, q, precision=_HI)
    t = jnp.matmul(q.T, aq, precision=_HI)
    w, v = jnp.linalg.eigh(t)
    w, v = w[::-1][:k], v[:, ::-1][:, :k]
    return w, jnp.matmul(q, v, precision=_HI)
