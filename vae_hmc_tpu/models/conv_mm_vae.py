"""Conv multimodal VAE with gated lyrics fusion (medium tier).

Re-design of reference scripts/12:83-190 in NHWC (TPU-native conv layout):
  - audio encoder: three 3x3 stride-2 convs (32/64/128 ch) + 256-d FC head ->
    (mu_a, logvar_a), latent 32;
  - lyrics projector: 384 -> 256 -> 128, ReLU, gated by the per-track
    presence mask (missing lyrics = zero vector + mask 0, see
    core.align.align_secondary_to_primary; reference 12:43-60, 12:177-178);
  - fusion MLP on [mu_a, l, m] -> (mu, logvar) of the final 32-d latent;
  - decoder: FC -> conv-transpose 4x4 stride-2 stack (64/32/1 ch), output
    cropped to the input (n_mels, T) (12:134-141, 12:260).

The torch original infers conv output shapes with a dummy forward
(12:92-96); here shapes are computed statically — XLA needs static shapes
anyway and the arithmetic is exact: H -> floor((H-1)/2)+1 per stride-2 conv.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vae_hmc_tpu.models.dense_vae import _dense, reparameterize
from vae_hmc_tpu.models.nn_init import torch_kernel_init


def _conv_out(n: int, k: int = 3, s: int = 2, p: int = 1) -> int:
    return (n + 2 * p - k) // s + 1


def conv_tower_shape(h: int, w: int, n_layers: int = 3) -> Tuple[int, int]:
    for _ in range(n_layers):
        h, w = _conv_out(h), _conv_out(w)
    return h, w


class ConvMMVAE(nn.Module):
    n_mels: int = 128
    n_frames: int = 646
    channels: Tuple[int, ...] = (32, 64, 128)
    fc_dim: int = 256
    latent_dim: int = 32
    lyrics_dim: int = 384
    lyrics_proj_dim: int = 128

    @property
    def enc_hw(self) -> Tuple[int, int]:
        return conv_tower_shape(self.n_mels, self.n_frames, len(self.channels))

    def setup(self):
        ch = self.channels
        self.convs = [
            nn.Conv(c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name=f"enc_conv{i + 1}", kernel_init=torch_kernel_init)
            for i, c in enumerate(ch)
        ]
        eh, ew = self.enc_hw
        flat = eh * ew * ch[-1]
        self.enc_fc = _dense(flat, self.fc_dim, "enc_fc")
        self.fc_mu_a = _dense(self.fc_dim, self.latent_dim, "mu_a")
        self.fc_logvar_a = _dense(self.fc_dim, self.latent_dim, "logvar_a")

        self.lyr1 = _dense(self.lyrics_dim, 256, "lyr1")
        self.lyr2 = _dense(256, self.lyrics_proj_dim, "lyr2")

        fuse_in = self.latent_dim + self.lyrics_proj_dim + 1
        self.fuse = _dense(fuse_in, 256, "fuse")
        self.fc_mu = _dense(256, self.latent_dim, "mu")
        self.fc_logvar = _dense(256, self.latent_dim, "logvar")

        self.dec_fc1 = _dense(self.latent_dim, 256, "dec_fc1")
        self.dec_fc2 = _dense(256, flat, "dec_fc2")
        dch = tuple(reversed(ch[:-1])) + (1,)          # (64, 32, 1)
        self.deconvs = [
            # padding='SAME' -> output = 2x input per layer, the same
            # upsampling arithmetic as torch ConvTranspose2d(k=4, s=2, p=1)
            # (flax's explicit-int padding counts transposed-conv padding
            # differently than torch, so SAME is the faithful choice).
            nn.ConvTranspose(c, (4, 4), strides=(2, 2), padding="SAME",
                             name=f"dec_conv{i + 1}",
                             kernel_init=torch_kernel_init)
            for i, c in enumerate(dch)
        ]

    # --- submodules -------------------------------------------------------

    def encode_audio(self, x):
        """x: (B, n_mels, T, 1) NHWC -> (mu_a, logvar_a)."""
        h = x
        for conv in self.convs:
            h = nn.relu(conv(h))
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(self.enc_fc(h))
        return self.fc_mu_a(h), self.fc_logvar_a(h)

    def project_lyrics(self, e):
        return nn.relu(self.lyr2(nn.relu(self.lyr1(e))))

    def fuse_latent(self, mu_a, l, m):
        h = nn.relu(self.fuse(jnp.concatenate([mu_a, l, m], axis=-1)))
        return self.fc_mu(h), self.fc_logvar(h)

    def decode(self, z):
        eh, ew = self.enc_hw
        h = nn.relu(self.dec_fc1(z))
        h = nn.relu(self.dec_fc2(h))
        h = h.reshape(h.shape[0], eh, ew, self.channels[-1])
        for deconv in self.deconvs[:-1]:
            h = nn.relu(deconv(h))
        h = self.deconvs[-1](h)
        return h[:, : self.n_mels, : self.n_frames, :]   # crop (ref 12:260)

    def encode(self, x, lyr, m):
        """Posterior mean path used for latent export (no sampling)."""
        mu_a, _ = self.encode_audio(x)
        l = self.project_lyrics(lyr) * m
        return self.fuse_latent(mu_a, l, m)

    def __call__(self, x, lyr, m, rng_key):
        """x (B,H,W,1), lyr (B,384), m (B,1) -> (xhat, mu, logvar)."""
        mu, logvar = self.encode(x, lyr, m)
        z = reparameterize(rng_key, mu, logvar)
        return self.decode(z), mu, logvar


def to_nhwc(x):
    """(N, 1, H, W) file-contract layout -> (N, H, W, 1) device layout.

    Accepts numpy or device arrays; device arrays are relayouted in place
    on device (no host round-trip)."""
    xp = jnp if isinstance(x, jax.Array) else np
    if x.ndim == 4 and x.shape[1] == 1:
        return xp.transpose(x, (0, 2, 3, 1))
    if x.ndim == 3:
        return x[..., None]
    return x
