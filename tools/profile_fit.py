"""Bisect the fused-fit slowdown: train_all (epochs fused in one scan)
vs the incremental per-epoch path, at bench scale (N=2924, batch 64).

Usage: python tools/profile_fit.py [--variant fast|incremental|norem] ...
Prints marginal seconds/epoch by differencing two epoch counts.
"""
from __future__ import annotations

import argparse
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

from vae_hmc_tpu.core.config import ConvMMVaeConfig
from vae_hmc_tpu.models import api as model_api


def run_fit(n, epochs, verbose_path, seed=0):
    cfg = ConvMMVaeConfig(epochs=epochs)
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (n, cfg.in_mels, cfg.in_frames, 1),
                          jnp.float32)
    lyr = jax.random.normal(key, (n, cfg.lyrics_dim), jnp.float32)
    mask = np.ones((n,), np.float32)
    t0 = time.perf_counter()
    from vae_hmc_tpu.models.conv_mm_vae import ConvMMVAE
    from vae_hmc_tpu.models.train import fit
    model = ConvMMVAE(n_mels=cfg.in_mels, n_frames=cfg.in_frames,
                      latent_dim=cfg.latent_dim, lyrics_dim=cfg.lyrics_dim)
    params = jax.jit(model.init)(key, x[:1], lyr[:1], mask[:1, None], key)

    def apply_fn(p, rng, xb, lb, mb):
        return model.apply(p, xb, lb, mb, rng)

    res = fit(apply_fn, params, (x, lyr, jnp.asarray(mask)[:, None]),
              epochs=epochs, batch_size=cfg.batch_size,
              learning_rate=cfg.learning_rate, beta=cfg.beta,
              reduction=cfg.loss_reduction, seed=cfg.seed,
              verbose=verbose_path, log_every=10**9)
    dt = time.perf_counter() - t0
    return dt, res.history[-1]["total"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="fast",
                    choices=["fast", "incremental", "norem"])
    ap.add_argument("--e1", type=int, default=1)
    ap.add_argument("--e2", type=int, default=5)
    args = ap.parse_args()
    n = 2880 if args.variant == "norem" else 2924
    verbose = args.variant == "incremental"
    t1, l1 = run_fit(n, args.e1, verbose)
    t2, l2 = run_fit(n, args.e2, verbose)
    per_epoch = (t2 - t1) / (args.e2 - args.e1)
    steps = n // 64 + (1 if n % 64 else 0)
    print(f"variant={args.variant} n={n}: e{args.e1}={t1:.1f}s "
          f"e{args.e2}={t2:.1f}s -> {per_epoch:.2f}s/epoch "
          f"({per_epoch / steps * 1e3:.1f} ms/step) "
          f"loss={l1:.4f}/{l2:.4f}")


if __name__ == "__main__":
    main()
