"""Measure TPU executable CODE SIZE and first-call wall time of the viz
programs (UMAP / t-SNE) plus the op-level patterns that blow them up.

Round-3 finding: on this tunneled dev chip, per-process *executable load*
is the dominant viz cost — programs run in ~2 s once loaded, but every
fresh process re-pays the transfer of each executable through the device
service at ~0.3-1 MB/s.  Op patterns measured at N=2924, k=15 (see the
table in VALIDATION.md "round 3 — scatter/gather code-size findings"):

  - scatter with 2-D indices (.at[rows, cols].set)      ~7 MB
    (same for segment_sum / vmapped-row / flat-1d forms)
  - diagonal .at[arange, arange].set                    ~5 MB
  - where(eye, ...) diagonal mask                        0.10 MB
  - fancy gather with an (E, R) index array              ~18 MB
    (the reshape fuses INTO the gather; optimization_barrier does not
    break the fusion)
  - the same gather as R column-wise 1-D row gathers     ~1 MB
  - plain 1-D row gathers, any index count               ~0.2 MB

Run on the chip:  python tools/profile_viz_programs.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
from pathlib import Path

# Run as a script from anywhere: put the repo root on sys.path (the dev
# container's site-packages .pth is not guaranteed to exist).
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vae_hmc_tpu.core.compile_cache import enable_persistent_cache

enable_persistent_cache()

N, K, R = 2924, 15, 5
E = 2 * N * K


def _code_mb(compiled) -> float:
    return compiled.memory_analysis().generated_code_size_in_bytes / 1e6


def op_patterns() -> None:
    d = jnp.zeros((N, N), jnp.float32)
    rows = jnp.zeros((N * K,), jnp.int32)
    cols = jnp.zeros((N * K,), jnp.int32)
    w = jnp.zeros((N * K,), jnp.float32)
    y = jnp.zeros((N, 2), jnp.float32)
    negs = jnp.zeros((E, R), jnp.int32)
    heads = jnp.zeros((E,), jnp.int32)
    cases = [
        ("scatter-set 2-D idx (N,N)<-(N*k)",
         lambda: jax.jit(lambda W, r, c, v: W.at[r, c].set(v))
         .lower(d, rows, cols, w)),
        ("diag .at[arange,arange].set",
         lambda: jax.jit(lambda a: a.at[jnp.arange(N), jnp.arange(N)]
                         .set(jnp.inf)).lower(d)),
        ("diag where(eye)",
         lambda: jax.jit(lambda a: jnp.where(jnp.eye(N, dtype=bool),
                                             jnp.inf, a)).lower(d)),
        ("fancy gather y[(E,R) idx]",
         lambda: jax.jit(lambda y_, g: y_[g]).lower(y, negs)),
        ("R column-wise 1-D gathers",
         lambda: jax.jit(lambda y_, g: jnp.stack(
             [y_[g[:, r]] for r in range(R)], axis=1)).lower(y, negs)),
        ("plain 1-D row gather (E,)",
         lambda: jax.jit(lambda y_, h: y_[h]).lower(y, heads)),
    ]
    for name, lower in cases:
        print(f"  {name}: {_code_mb(lower().compile()):.2f} MB", flush=True)


def viz_programs() -> None:
    from vae_hmc_tpu.viz import umap as U
    from vae_hmc_tpu.viz.tsne import _tsne_optimize

    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(N, 16)).astype(np.float32))
    knn_d, knn_i = U._knn(x, K)
    rho, sigma = U._smooth_knn(knn_d)
    heads, tails, weights = U._edge_weights(knn_d, knn_i, rho, sigma)
    eps = U._eps_per_sample(weights, 500)
    y0 = jnp.zeros((N, 2), jnp.float32)
    key = jax.random.PRNGKey(0)
    progs = [
        ("umap._knn", U._knn.lower(x, K)),
        ("umap._edge_weights",
         U._edge_weights.lower(knn_d, knn_i, rho, sigma)),
        ("umap._spectral_init_sparse",
         U._spectral_init_sparse.lower(heads, tails, weights, N)),
        ("umap._optimize",
         U._optimize.lower(y0, heads, tails, eps, key, 1.5, 1.0,
                           n_epochs=500, neg_rate=5, lr=1.0)),
        ("tsne._tsne_optimize",
         _tsne_optimize.lower(jnp.zeros((N, N), jnp.float32), y0,
                              200.0, 1500)),
    ]
    for name, lowered in progs:
        print(f"  {name}: {_code_mb(lowered.compile()):.2f} MB", flush=True)


def umap_wall() -> None:
    from vae_hmc_tpu.viz.umap import umap_2d

    x = np.random.default_rng(0).normal(size=(N, 16)).astype(np.float32)
    t0 = time.perf_counter()
    umap_2d(x)
    print(f"  umap_2d first call (compile/load + run): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    umap_2d(x)
    print(f"  umap_2d second call (run): {time.perf_counter() - t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((4,))))
    print(f"connect: {time.perf_counter() - t0:.1f}s", flush=True)
    print("op patterns (code size):", flush=True)
    op_patterns()
    print("viz programs (code size):", flush=True)
    viz_programs()
    print("umap wall time:", flush=True)
    umap_wall()
