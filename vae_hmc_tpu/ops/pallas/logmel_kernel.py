"""Fused mel->dB->standardize Pallas kernel.

Takes the power spectrogram (B, F, T) from the XLA rFFT and performs, per
sample, entirely in VMEM:
    mel = MelFB (M, F) @ spec (F, T)          [MXU]
    db  = 10*log10(max(mel, amin)) - 10*log10(max(ref, amin)), ref = max(mel)
    out = (db - mean(db)) / (std(db) + 1e-6)  [optional]
in ONE pass over HBM: one read of the spectrogram block, one write of the
(M, T) feature block.  The XLA fallback (ops.mel.logmel_batch +
per_sample_standardize) materializes the mel array and re-reads it for each
of the max / log / mean / std reductions; at (128, 646) the whole per-sample
working set fits VMEM (~2.9 MB spec + 0.33 MB mel), so the fusion removes
every intermediate HBM round trip of the reference's hottest feature stage
(SURVEY.md §2b row 1).

Grid: one program per sample.  The mel filterbank tile (M, F) ~ 0.5 MB is
replicated into VMEM for every program.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_AMIN = 1e-10
_LOG10 = float(np.log(10.0))


def _kernel(spec_ref, fb_ref, out_ref, *, ref_max: bool,
            top_db: Optional[float], standardize: bool, eps: float):
    spec = spec_ref[0]                       # (F, T)
    fb = fb_ref[:]                           # (M, F)
    mel = jnp.dot(fb, spec, preferred_element_type=jnp.float32)  # (M, T)
    log_spec = (10.0 / _LOG10) * jnp.log(jnp.maximum(mel, _AMIN))
    if ref_max:
        ref = jnp.max(mel)
        log_spec = log_spec - (10.0 / _LOG10) * jnp.log(
            jnp.maximum(ref, _AMIN))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    if standardize:
        mu = jnp.mean(log_spec)
        sd = jnp.sqrt(jnp.mean((log_spec - mu) ** 2)) + eps
        log_spec = (log_spec - mu) / sd
    out_ref[0] = log_spec


@partial(jax.jit, static_argnames=("n_mels", "ref_max", "top_db",
                                   "standardize", "eps", "interpret"))
def mel_db_standardize(spec: jax.Array, fb: jax.Array, n_mels: int = 128,
                       ref_max: bool = True,
                       top_db: Optional[float] = None,
                       standardize: bool = True, eps: float = 1e-6,
                       interpret: bool = False) -> jax.Array:
    """(B, F, T) power spec + (M, F) filterbank -> (B, M, T) features."""
    b, f, t = spec.shape
    kernel = partial(_kernel, ref_max=ref_max, top_db=top_db,
                     standardize=standardize, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, f, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mels, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_mels, t), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_mels, t), jnp.float32),
        interpret=interpret,
    )(spec, fb)


def logmel_standardized_pallas(y: jax.Array, cfg, interpret: bool = False):
    """Full pipeline: waveforms -> fused pallas features (drop-in for
    ops.mel.logmel_batch + per_sample_standardize)."""
    from vae_hmc_tpu.ops.mel import mel_filterbank
    from vae_hmc_tpu.ops.stft import power_spectrogram

    spec = power_spectrogram(y, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                             power=cfg.power)
    fb = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                                    cfg.fmin, cfg.fmax))
    top_db = cfg.top_db if (cfg.top_db is not None and cfg.top_db > 0) else None
    return mel_db_standardize(spec, fb, cfg.n_mels, cfg.ref_max, top_db,
                              cfg.per_sample_standardize,
                              interpret=interpret)
