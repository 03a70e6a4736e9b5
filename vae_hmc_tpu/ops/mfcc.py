"""MFCC + stats pooling, batched on device.

Replaces the reference's per-track librosa.feature.mfcc loop — the hottest
loop of the whole system (reference scripts/06:56-141, 18:73-97; SURVEY.md
§3.1).  librosa semantics: mel power spectrogram (n_mels=128, fmax=sr/2) ->
power_to_db(ref=1.0, top_db=80) -> DCT-II ortho along the mel axis -> first
n_mfcc rows.  The DCT is expressed as a static (n_mfcc, n_mels) matrix so the
whole chain is two MXU matmuls around the FFT.

Stats pooling = concat(mean_t, std_t) per coefficient (06:83-87, 18:91-93),
with optional per-track frame masks for the hard tier's variable-length clips
(18:88: tracks are loaded up to 20 s *without* padding, so T varies).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vae_hmc_tpu.core.config import MfccConfig
from vae_hmc_tpu.ops.mel import apply_mel, mel_filterbank, power_to_db
from vae_hmc_tpu.ops.stft import num_frames, power_spectrogram


def dct_ii_matrix(n_out: int, n_in: int, dtype=np.float32) -> np.ndarray:
    """(n_out, n_in) orthonormal DCT-II matrix (scipy.fftpack.dct norm='ortho')."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    mat = np.sqrt(2.0 / n_in) * np.cos(np.pi * k * (2 * n + 1) / (2.0 * n_in))
    mat[0, :] *= 1.0 / np.sqrt(2.0)
    return mat.astype(dtype)


@partial(jax.jit, static_argnames=("cfg",))
def mfcc_batch(y: jax.Array, cfg: MfccConfig = MfccConfig()) -> jax.Array:
    """Waveforms (B, n_samples) -> MFCC (B, n_mfcc, T)."""
    spec = power_spectrogram(y, n_fft=cfg.n_fft, hop_length=cfg.hop_length)
    fb = jnp.asarray(mel_filterbank(
        cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax))
    mel = apply_mel(spec, fb)                                  # (B, n_mels, T)
    db = power_to_db(mel, ref_max=False, top_db=80.0)          # librosa mfcc default
    dct = jnp.asarray(dct_ii_matrix(cfg.n_mfcc, cfg.n_mels))
    return jnp.einsum("km,bmt->bkt", dct, db,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


def stats_pool(
    feats: jax.Array,
    frame_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, C, T) -> (B, 2C) [mean_t || std_t], population std (ddof=0).

    `frame_mask` (B, T) restricts the statistics to valid frames — used for
    the hard tier where clips shorter than the 20 s budget keep their true
    length (reference scripts/18:88-93 computes stats over the actual T).
    """
    if frame_mask is None:
        mu = jnp.mean(feats, axis=-1)
        sd = jnp.std(feats, axis=-1)
    else:
        m = frame_mask[:, None, :]                             # (B, 1, T)
        cnt = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
        mu = jnp.sum(feats * m, axis=-1) / cnt
        var = jnp.sum(((feats - mu[..., None]) * m) ** 2, axis=-1) / cnt
        sd = jnp.sqrt(var)
    return jnp.concatenate([mu, sd], axis=-1)


def frame_mask_from_lengths(lengths: jax.Array, n_samples: int, cfg: MfccConfig) -> jax.Array:
    """Sample lengths (B,) -> frame validity mask (B, T) under center=True
    framing (valid frames = 1 + length // hop, librosa stft semantics)."""
    t = num_frames(n_samples, cfg.n_fft, cfg.hop_length, center=True)
    valid = 1 + lengths // cfg.hop_length
    idx = jnp.arange(t)[None, :]
    return (idx < valid[:, None]).astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg",))
def mfcc_stats_batch(
    y: jax.Array,
    cfg: MfccConfig = MfccConfig(),
    lengths: Optional[jax.Array] = None,
) -> jax.Array:
    """Full fused path: waveforms -> (B, 2*n_mfcc) stats vectors.

    Drop-in device replacement for reference scripts/06:56-89
    `extract_mfcc_feature` (easy preset: fixed 30 s pad/trim, lengths=None)
    and scripts/18:73-97 `extract_mfcc_stats` (hard preset: pass true lengths).
    """
    feats = mfcc_batch(y, cfg)
    mask = None
    if lengths is not None:
        mask = frame_mask_from_lengths(lengths, y.shape[-1], cfg)
    return stats_pool(feats, mask)
