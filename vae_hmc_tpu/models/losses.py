"""ELBO losses — both reference reduction conventions, explicitly.

The reference uses two inconsistent reductions (SURVEY.md §7 "hard parts"):
  - "mean" (scripts 06:182-188 and 12:262-264): recon = MSE mean over all
    elements; KL = -0.5 * mean(1 + logvar - mu^2 - e^logvar) over all
    elements; loss = recon + beta * kl.
  - "sum" (script 19:226-228): per-sample sums (MSE summed over features, KL
    summed over latent dims), then mean over the batch.
These differ by factors of feature_dim/latent_dim and give very different
effective beta — they are kept as named options so each pipeline preset uses
its reference's convention.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def elbo_loss(xhat, x, mu, logvar, beta: float = 1.0,
              reduction: str = "mean") -> Tuple[jnp.ndarray, Dict]:
    if reduction == "mean":
        recon = jnp.mean((xhat - x) ** 2)
        kl = -0.5 * jnp.mean(1.0 + logvar - mu ** 2 - jnp.exp(logvar))
    elif reduction == "sum":
        b = x.shape[0]
        recon = jnp.mean(jnp.sum((xhat - x) ** 2, axis=tuple(range(1, x.ndim))))
        kl = jnp.mean(-0.5 * jnp.sum(
            1.0 + logvar - mu ** 2 - jnp.exp(logvar), axis=-1))
    else:
        raise ValueError(f"unknown reduction {reduction!r}")
    loss = recon + beta * kl
    return loss, {"recon": recon, "kl": kl, "total": loss}
