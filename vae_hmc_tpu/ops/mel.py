"""Mel filterbank + log-mel spectrograms (librosa-parity semantics, TPU layout).

The filterbank is a static (n_mels, n_freq) matrix built once on host with
librosa's documented Slaney construction (linear <1 kHz, log above, slaney
area normalization; librosa.filters.mel defaults htk=False, norm='slaney'),
then the per-batch work is a single MXU matmul (n_mels x n_freq) @ (n_freq, T)
fused with the dB log — replacing the reference's per-track
librosa.feature.melspectrogram + power_to_db calls (reference scripts/10:55-66).

power_to_db follows librosa exactly, including the per-*sample* ref=max
reduction (each track's own max is its 0 dB reference) and the optional
per-sample top_db floor.  The medium-tier preset uses ref=max, top_db=None
(reference scripts/10:62-66 with the script's default top_db=-1 -> None).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vae_hmc_tpu.core.config import MelConfig
from vae_hmc_tpu.ops.stft import power_spectrogram


# ---------------------------------------------------------------------------
# Filterbank construction (host, static)
# ---------------------------------------------------------------------------


def hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False)."""
    freq = np.asanyarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        log_t = freq >= min_log_hz
        mels[log_t] = min_log_mel + np.log(freq[log_t] / min_log_hz) / logstep
    elif freq >= min_log_hz:
        mels = min_log_mel + np.log(freq / min_log_hz) / logstep
    return mels


def mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asanyarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        log_t = mels >= min_log_mel
        freqs[log_t] = min_log_hz * np.exp(logstep * (mels[log_t] - min_log_mel))
    elif mels >= min_log_mel:
        freqs = min_log_hz * np.exp(logstep * (mels - min_log_mel))
    return freqs


def mel_frequencies(n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    return mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels))


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    dtype=np.float32,
) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) triangular Slaney-normalized filterbank."""
    if fmax is None:
        fmax = sr / 2.0
    n_freq = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freq)
    mel_f = mel_frequencies(n_mels + 2, fmin, fmax)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2: n_mels + 2] - mel_f[:n_mels])      # slaney norm
    weights *= enorm[:, None]
    return weights.astype(dtype)


# ---------------------------------------------------------------------------
# Device ops
# ---------------------------------------------------------------------------


def power_to_db(
    s: jax.Array,
    ref_max: bool = True,
    amin: float = 1e-10,
    top_db: Optional[float] = 80.0,
) -> jax.Array:
    """librosa.power_to_db over a batch: (B, n_mels, T) -> dB.

    ref_max=True reproduces power_to_db(S, ref=np.max): each sample's own max
    is the reference.  ref_max=False uses ref=1.0 (the librosa default used
    inside librosa.feature.mfcc).
    """
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, s))
    if ref_max:
        ref = jnp.max(s, axis=(-2, -1), keepdims=True)
        log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
        log_spec = jnp.maximum(log_spec, peak - top_db)
    return log_spec


def apply_mel(spec: jax.Array, fb: jax.Array) -> jax.Array:
    """(B, F, T) power spec x (n_mels, F) filterbank -> (B, n_mels, T).

    One batched MXU matmul; this plus the log is the hot op the reference runs
    per-track on CPU.
    """
    return jnp.einsum("mf,bft->bmt", fb, spec,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("cfg",))
def logmel_batch(y: jax.Array, cfg: MelConfig = MelConfig()) -> jax.Array:
    """Waveform batch (B, n_samples) -> log-mel dB (B, n_mels, T).

    Fused device pipeline replacing reference scripts/10:55-66
    (melspectrogram -> power_to_db(ref=max)).
    """
    spec = power_spectrogram(
        y, n_fft=cfg.n_fft, hop_length=cfg.hop_length, power=cfg.power)
    fb = jnp.asarray(mel_filterbank(
        cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax))
    mel = apply_mel(spec, fb)
    top_db = cfg.top_db if cfg.top_db is not None and cfg.top_db > 0 else None
    return power_to_db(mel, ref_max=cfg.ref_max, top_db=top_db)


def per_sample_standardize(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Whole-spectrogram mean/std per sample (reference scripts/10:69-72).

    Note the reference adds eps=1e-6 to the std, not to the variance.
    """
    axes = tuple(range(1, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    sd = jnp.std(x, axis=axes, keepdims=True) + eps
    return (x - mu) / sd
