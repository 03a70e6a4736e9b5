"""Deterministic autoencoder baseline (reference scripts/22:66-88).

enc: in -> 256 -> 256 -> z (ReLU between, linear bottleneck);
dec: z -> 256 -> 256 -> in (ReLU between, linear output).
Used only as the hard-tier comparison arm (22:139-171).
"""
from __future__ import annotations

import flax.linen as nn

from vae_hmc_tpu.models.dense_vae import _dense


class AE(nn.Module):
    input_dim: int
    hidden_dim: int = 256
    latent_dim: int = 16

    def setup(self):
        h, z = self.hidden_dim, self.latent_dim
        self.e1 = _dense(self.input_dim, h, "e1")
        self.e2 = _dense(h, h, "e2")
        self.e3 = _dense(h, z, "e3")
        self.d1 = _dense(z, h, "d1")
        self.d2 = _dense(h, h, "d2")
        self.d3 = _dense(h, self.input_dim, "d3")

    def encode(self, x):
        h = nn.relu(self.e1(x))
        h = nn.relu(self.e2(h))
        return self.e3(h)

    def decode(self, z):
        h = nn.relu(self.d1(z))
        h = nn.relu(self.d2(h))
        return self.d3(h)

    def __call__(self, x):
        z = self.encode(x)
        return self.decode(z), z
