"""Per-substep timing of the script-15 viz path on the chip.

Isolates: mel-flat KMeans, per-rep UMAP (knn / smooth+W+edges / spectral /
optimize), PCA(2) projections, DBSCAN sweep — each timed twice (compile vs
warm).  Run: python tools/profile_viz15.py [--n 2924]
"""
from __future__ import annotations

import argparse
import time
import jax

import sys
from pathlib import Path

# Run as a script from anywhere: put the repo root on sys.path (the dev
# container's site-packages .pth is not guaranteed to exist).
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vae_hmc_tpu.core.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np


def t(name, fn, n=2):
    for i in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out) if out is not None else None
        print(f"  {name} [{'cold' if i == 0 else 'warm'}]: "
              f"{time.perf_counter() - t0:.2f}s", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2924)
    args = ap.parse_args()

    from vae_hmc_tpu.core.config import MelConfig
    from vae_hmc_tpu.ops import mel as mel_ops
    from vae_hmc_tpu.pipelines import synthetic

    mcfg = MelConfig()
    ds = synthetic.make_dataset(args.n, seed=42, lyrics_coverage=0.9)
    feats = []
    for s in range(0, args.n, 128):
        idx = list(range(s, min(s + 128, args.n)))
        wb = synthetic.waveform_batch_device(ds, idx, mcfg.duration_s, seed=42)
        feats.append(mel_ops.per_sample_standardize(
            mel_ops.logmel_batch(wb, mcfg)))
    x_mel = jnp.concatenate(feats, axis=0).reshape(args.n, -1)
    del feats
    jax.block_until_ready(x_mel)
    print(f"x_mel {x_mel.shape}", flush=True)

    rng = np.random.default_rng(0)
    x_vae = jnp.asarray(rng.normal(0, 1, (args.n, 32)), jnp.float32)
    x_lyr = jnp.asarray(rng.normal(0, 1, (args.n, 384)), jnp.float32)

    from vae_hmc_tpu.cluster.dbscan import dbscan_sweep
    from vae_hmc_tpu.cluster.kmeans import kmeans_fit_predict
    from vae_hmc_tpu.ops.pca import PCA
    from vae_hmc_tpu.viz import umap as um

    t("kmeans mel k=6 n_init=10",
      lambda: jnp.asarray(kmeans_fit_predict(x_mel, 6, n_init=10)))
    t("PCA2 mel (gram)", lambda: PCA(2).fit_transform(x_mel))
    t("PCA2 vae", lambda: PCA(2).fit_transform(x_vae))
    t("dbscan sweep lyrics 7eps",
      lambda: list(dbscan_sweep(x_lyr, [0.2, 0.3, 0.4, 0.5, 0.6, 0.8, 1.0],
                                [5]).values())[-1])

    for name, x in (("vae", x_vae), ("lyrics", x_lyr), ("mel", x_mel)):
        knn = t(f"umap/{name} knn", lambda: um._knn(x, 15))
        knn_d, knn_i = knn
        rs = t(f"umap/{name} smooth", lambda: um._smooth_knn(knn_d))
        rho, sigma = rs
        W = t(f"umap/{name} build_w",
              lambda: um._build_w(knn_d, knn_i, rho, sigma))
        edges = t(f"umap/{name} edges", lambda: um._edge_list(W, knn_i))
        heads, tails, weights = edges
        eps = t(f"umap/{name} eps", lambda: um._eps_per_sample(weights, 500))
        y0 = t(f"umap/{name} spectral", lambda: um._spectral_init(W))
        a, b = um.find_ab_params(1.0, 0.1)
        key = jax.random.PRNGKey(0)
        t(f"umap/{name} optimize500",
          lambda: um._optimize(y0.astype(jnp.float32), heads, tails, eps,
                               key, a, b, n_epochs=500, neg_rate=5, lr=1.0))


if __name__ == "__main__":
    main()
