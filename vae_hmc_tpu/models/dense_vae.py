"""Dense (MLP) VAE family: basic VAE, Beta-VAE, CVAE — one Flax module.

Covers three reference models with one parameterization:
  - easy-tier basic VAE (reference scripts/06:145-179): enc
    input->256->256 -> (mu, logvar latent=16); dec latent->256->256->input;
  - hard-tier Beta-VAE (19:64-121 with conditional=False): same topology,
    beta=4;
  - hard-tier CVAE (19:64-121 conditional=True): condition one-hot
    concatenated to the encoder input AND to z at the decoder input
    (19:99-102, 19:110-115).

ReLU activations, linear output (reconstruction in standardized feature
space).  The reparameterize + decode runs inside one jitted train step
(models/train.py), so sampling, ELBO and backward all fuse into a single
XLA program — there is no per-layer kernel-launch cost to amortize as in the
torch reference.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vae_hmc_tpu.models.nn_init import torch_bias_init_for, torch_kernel_init


def _dense(feat_in: int, feat_out: int, name: str) -> nn.Dense:
    return nn.Dense(feat_out, name=name, kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init_for(feat_in))


class DenseVAE(nn.Module):
    input_dim: int
    hidden_dims: Tuple[int, ...] = (256, 256)
    latent_dim: int = 16
    cond_dim: int = 0           # >0 with conditional=True -> CVAE

    @property
    def conditional(self) -> bool:
        return self.cond_dim > 0

    def setup(self):
        enc_in = self.input_dim + self.cond_dim
        dims = (enc_in,) + tuple(self.hidden_dims)
        self.enc_layers = [
            _dense(dims[i], dims[i + 1], f"enc{i + 1}")
            for i in range(len(self.hidden_dims))
        ]
        h = self.hidden_dims[-1]
        self.fc_mu = _dense(h, self.latent_dim, "mu")
        self.fc_logvar = _dense(h, self.latent_dim, "logvar")
        dec_in = self.latent_dim + self.cond_dim
        ddims = (dec_in,) + tuple(reversed(self.hidden_dims))
        self.dec_layers = [
            _dense(ddims[i], ddims[i + 1], f"dec{i + 1}")
            for i in range(len(self.hidden_dims))
        ]
        self.fc_out = _dense(ddims[-1], self.input_dim, "out")

    def encode(self, x, c: Optional[jax.Array] = None):
        if self.conditional:
            x = jnp.concatenate([x, c], axis=-1)
        h = x
        for layer in self.enc_layers:
            h = nn.relu(layer(h))
        return self.fc_mu(h), self.fc_logvar(h)

    def decode(self, z, c: Optional[jax.Array] = None):
        if self.conditional:
            z = jnp.concatenate([z, c], axis=-1)
        h = z
        for layer in self.dec_layers:
            h = nn.relu(layer(h))
        return self.fc_out(h)

    def __call__(self, x, rng_key, c: Optional[jax.Array] = None):
        mu, logvar = self.encode(x, c)
        z = reparameterize(rng_key, mu, logvar)
        xhat = self.decode(z, c)
        return xhat, mu, logvar


def reparameterize(key, mu, logvar):
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return mu + eps * std
