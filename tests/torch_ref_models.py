"""Reference torch modules rebuilt as oracle test fixtures.

These replicate the reference's four model architectures operation-for-
operation (citations inline) so tests/test_torch_oracle.py can transplant
identical weights into the Flax models and diff forwards/losses/gradients.
They are TEST FIXTURES, not product code — the production models are the
Flax modules in vae_hmc_tpu/models/.

One deliberate deviation: ``reparameterize``/``reparam`` accept an optional
``eps`` tensor (the reference draws ``torch.randn_like`` inline,
06:165-168 / 12:169-172 / 19:104-107).  RNG streams cannot match across
frameworks, so the tests inject a shared eps into both sides; with
``eps=None`` the behavior is the reference's.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class RefMLPVAE(nn.Module):
    """Easy-tier basic VAE — reference scripts/06:145-179."""

    def __init__(self, input_dim: int, hidden_dim: int, latent_dim: int):
        super().__init__()
        self.enc1 = nn.Linear(input_dim, hidden_dim)
        self.enc2 = nn.Linear(hidden_dim, hidden_dim)
        self.mu = nn.Linear(hidden_dim, latent_dim)
        self.logvar = nn.Linear(hidden_dim, latent_dim)
        self.dec1 = nn.Linear(latent_dim, hidden_dim)
        self.dec2 = nn.Linear(hidden_dim, hidden_dim)
        self.out = nn.Linear(hidden_dim, input_dim)

    def encode(self, x):
        h = F.relu(self.enc1(x))
        h = F.relu(self.enc2(h))
        return self.mu(h), self.logvar(h)

    def reparameterize(self, mu, logvar, eps: Optional[torch.Tensor] = None):
        std = torch.exp(0.5 * logvar)
        if eps is None:
            eps = torch.randn_like(std)
        return mu + eps * std

    def decode(self, z):
        h = F.relu(self.dec1(z))
        h = F.relu(self.dec2(h))
        return self.out(h)

    def forward(self, x, eps: Optional[torch.Tensor] = None):
        mu, logvar = self.encode(x)
        z = self.reparameterize(mu, logvar, eps)
        return self.decode(z), mu, logvar


def ref_vae_loss_mean(xhat, x, mu, logvar, beta: float):
    """Reference 06:182-188 (and 12:262-264): element-mean MSE + element-mean
    KL."""
    recon = F.mse_loss(xhat, x, reduction="mean")
    kl = -0.5 * torch.mean(1.0 + logvar - mu.pow(2) - logvar.exp())
    return recon + beta * kl, recon, kl


def ref_vae_loss_sum(xhat, x, mu, logvar, beta: float):
    """Reference 19:226-228: per-sample feature-sum MSE + per-sample
    latent-sum KL, then batch mean."""
    rec = F.mse_loss(xhat, x, reduction="none").sum(dim=1)
    kl = -0.5 * torch.sum(1 + logvar - mu.pow(2) - logvar.exp(), dim=1)
    return (rec + beta * kl).mean(), rec.mean(), kl.mean()


class RefAudioEncoder(nn.Module):
    """Reference 12:83-108, including the dummy-forward shape inference."""

    def __init__(self, in_ch: int, z_dim: int, feat_hw: Tuple[int, int]):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(in_ch, 32, 3, stride=2, padding=1), nn.ReLU(),
            nn.Conv2d(32, 64, 3, stride=2, padding=1), nn.ReLU(),
            nn.Conv2d(64, 128, 3, stride=2, padding=1), nn.ReLU(),
        )
        with torch.no_grad():
            h = self.conv(torch.zeros(1, in_ch, feat_hw[0], feat_hw[1]))
            self.h_shape = h.shape[1:]
        flat = int(np.prod(self.h_shape))
        self.fc = nn.Sequential(nn.Linear(flat, 256), nn.ReLU())
        self.mu = nn.Linear(256, z_dim)
        self.logvar = nn.Linear(256, z_dim)

    def forward(self, x):
        h = self.conv(x).flatten(1)
        h = self.fc(h)
        return self.mu(h), self.logvar(h)


class RefLyricsProjector(nn.Module):
    """Reference 12:111-120."""

    def __init__(self, in_dim: int, out_dim: int = 128):
        super().__init__()
        self.net = nn.Sequential(nn.Linear(in_dim, 256), nn.ReLU(),
                                 nn.Linear(256, out_dim), nn.ReLU())

    def forward(self, e):
        return self.net(e)


class RefAudioDecoder(nn.Module):
    """Reference 12:123-141."""

    def __init__(self, z_dim: int, out_ch: int, h_shape):
        super().__init__()
        C, H, W = h_shape
        self.h_shape = (C, H, W)
        self.fc = nn.Sequential(nn.Linear(z_dim, 256), nn.ReLU(),
                                nn.Linear(256, C * H * W), nn.ReLU())
        self.deconv = nn.Sequential(
            nn.ConvTranspose2d(C, 64, 4, stride=2, padding=1), nn.ReLU(),
            nn.ConvTranspose2d(64, 32, 4, stride=2, padding=1), nn.ReLU(),
            nn.ConvTranspose2d(32, out_ch, 4, stride=2, padding=1),
        )

    def forward(self, z):
        h = self.fc(z).view(z.size(0), *self.h_shape)
        return self.deconv(h)


class RefConvMultiModalVAE(nn.Module):
    """Reference 12:145-190: gated lyrics fusion over the audio posterior."""

    def __init__(self, in_ch: int, feat_hw, z_dim: int, lyr_dim: int):
        super().__init__()
        self.audio_enc = RefAudioEncoder(in_ch, z_dim, feat_hw)
        self.lyr_proj = RefLyricsProjector(lyr_dim, out_dim=128)
        self.fuse = nn.Sequential(nn.Linear(z_dim + 128 + 1, 256), nn.ReLU())
        self.mu = nn.Linear(256, z_dim)
        self.logvar = nn.Linear(256, z_dim)
        self.audio_dec = RefAudioDecoder(z_dim, in_ch, self.audio_enc.h_shape)

    @staticmethod
    def reparam(mu, logvar, eps: Optional[torch.Tensor] = None):
        std = torch.exp(0.5 * logvar)
        if eps is None:
            eps = torch.randn_like(std)
        return mu + eps * std

    def forward(self, x, lyr, m, eps: Optional[torch.Tensor] = None):
        mu_a, lv_a = self.audio_enc(x)
        l = self.lyr_proj(lyr)
        l = l * m
        h = self.fuse(torch.cat([mu_a, l, m], dim=1))
        mu, lv = self.mu(h), self.logvar(h)
        z = self.reparam(mu, lv, eps)
        return self.audio_dec(z), mu, lv


class RefHardMLPVAE(nn.Module):
    """Hard-tier Beta-VAE / CVAE — reference 19:64-121 (Sequential naming)."""

    def __init__(self, input_dim: int, latent_dim: int = 16,
                 hidden_dim: int = 256, cond_dim: int = 0,
                 conditional: bool = False):
        super().__init__()
        self.conditional = conditional
        enc_in = input_dim + (cond_dim if conditional else 0)
        self.enc = nn.Sequential(
            nn.Linear(enc_in, hidden_dim), nn.ReLU(),
            nn.Linear(hidden_dim, hidden_dim), nn.ReLU(),
        )
        self.mu = nn.Linear(hidden_dim, latent_dim)
        self.logvar = nn.Linear(hidden_dim, latent_dim)
        dec_in = latent_dim + (cond_dim if conditional else 0)
        self.dec = nn.Sequential(
            nn.Linear(dec_in, hidden_dim), nn.ReLU(),
            nn.Linear(hidden_dim, hidden_dim), nn.ReLU(),
            nn.Linear(hidden_dim, input_dim),
        )

    def encode(self, x, c=None):
        if self.conditional:
            x = torch.cat([x, c], dim=1)
        h = self.enc(x)
        return self.mu(h), self.logvar(h)

    def reparameterize(self, mu, logvar, eps: Optional[torch.Tensor] = None):
        std = torch.exp(0.5 * logvar)
        if eps is None:
            eps = torch.randn_like(std)
        return mu + eps * std

    def decode(self, z, c=None):
        if self.conditional:
            z = torch.cat([z, c], dim=1)
        return self.dec(z)

    def forward(self, x, c=None, eps: Optional[torch.Tensor] = None):
        mu, logvar = self.encode(x, c)
        z = self.reparameterize(mu, logvar, eps)
        return self.decode(z, c), mu, logvar


class RefAE(nn.Module):
    """Hard-tier deterministic autoencoder baseline — reference 22:66-88."""

    def __init__(self, in_dim: int, z_dim: int = 16, hidden: int = 256):
        super().__init__()
        self.enc = nn.Sequential(
            nn.Linear(in_dim, hidden), nn.ReLU(),
            nn.Linear(hidden, hidden), nn.ReLU(),
            nn.Linear(hidden, z_dim),
        )
        self.dec = nn.Sequential(
            nn.Linear(z_dim, hidden), nn.ReLU(),
            nn.Linear(hidden, hidden), nn.ReLU(),
            nn.Linear(hidden, in_dim),
        )

    def forward(self, x):
        z = self.enc(x)
        return self.dec(z), z
