"""Parity of the device DSP kernels vs the independent librosa-semantics oracle."""
import numpy as np
import pytest

from vae_hmc_tpu.core.config import MelConfig, MfccConfig
from vae_hmc_tpu.ops import mel as mel_ops
from vae_hmc_tpu.ops import mfcc as mfcc_ops
from vae_hmc_tpu.ops import stft as stft_ops

from tests import oracle_dsp as oracle

SR = 22050


def _signals(n, dur_s, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * dur_s)) / SR
    out = []
    for i in range(n):
        f0 = rng.uniform(80, 2000)
        sig = (np.sin(2 * np.pi * f0 * t)
               + 0.5 * np.sin(2 * np.pi * 2.7 * f0 * t)
               + 0.1 * rng.standard_normal(t.shape))
        out.append(sig.astype(np.float32))
    return np.stack(out)


def test_power_spectrogram_matches_oracle():
    y = _signals(2, 1.0)
    ours = np.asarray(stft_ops.power_spectrogram(y, 2048, 512))
    for i in range(len(y)):
        ref = oracle.stft_power(y[i], 2048, 512)
        assert ours[i].shape == ref.shape
        np.testing.assert_allclose(ours[i], ref, rtol=1e-3, atol=1e-2)


def test_power_spectrogram_dft_matches_fft():
    """The MXU-matmul rDFT path (default, code-size diet) vs native FFT.

    Both are gated against the scipy oracle above; this pins their mutual
    agreement at f32 roundoff so a regression in either lowering is caught
    without oracle slack."""
    y = _signals(2, 1.0)
    dft = np.asarray(stft_ops.power_spectrogram(y, 2048, 512, method="dft"))
    fft = np.asarray(stft_ops.power_spectrogram(y, 2048, 512, method="fft"))
    scale = np.maximum(np.abs(fft), 1e-3)
    np.testing.assert_allclose(dft / scale, fft / scale, atol=2e-3)


def test_mel_filterbank_matches_oracle():
    ours = mel_ops.mel_filterbank(SR, 2048, 128)
    ref = oracle.mel_fb(SR, 2048, 128)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_logmel_db_refmax_matches_oracle():
    cfg = MelConfig(duration_s=1.0, top_db=-1.0)  # top_db<=0 -> None (ref 10 default)
    y = _signals(2, 1.0)
    ours = np.asarray(mel_ops.logmel_batch(y, cfg))
    for i in range(len(y)):
        ref = oracle.logmel_db_ref_max(y[i], top_db=None)
        np.testing.assert_allclose(ours[i], ref, rtol=1e-3, atol=2e-2)


def test_mfcc_stats_matches_oracle():
    cfg = MfccConfig(duration_s=1.0)
    y = _signals(3, 1.0)
    ours = np.asarray(mfcc_ops.mfcc_stats_batch(y, cfg))
    for i in range(len(y)):
        ref = oracle.mfcc_stats(y[i])
        assert ours[i].shape == ref.shape == (80,)
        # dB-scale features, magnitudes O(10-100); atol dominates
        np.testing.assert_allclose(ours[i], ref, rtol=5e-3, atol=5e-2)


def test_mfcc_stats_variable_length_mask():
    """Hard-tier semantics: stats over true frames only (ref scripts/18:88-93)."""
    cfg = MfccConfig(duration_s=2.0)
    full = _signals(1, 2.0)[0]
    short_len = int(SR * 1.3)
    short = full[:short_len]
    padded = stft_ops.pad_with_reflect_tail(short, len(full), cfg.n_fft)[None, :]
    lengths = np.asarray([short_len])
    ours = np.asarray(mfcc_ops.mfcc_stats_batch(padded, cfg, lengths=lengths))[0]
    ref = oracle.mfcc_stats(short)
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-2)


def test_per_sample_standardize():
    x = np.random.default_rng(1).normal(3.0, 5.0, (4, 16, 20)).astype(np.float32)
    z = np.asarray(mel_ops.per_sample_standardize(x))
    for i in range(4):
        mu, sd = x[i].mean(), x[i].std() + 1e-6
        np.testing.assert_allclose(z[i], (x[i] - mu) / sd, rtol=1e-4, atol=1e-5)


def test_frame_counts():
    cfg = MelConfig()
    assert cfg.n_frames == 1 + cfg.n_samples // cfg.hop_length == 646


def test_slice_framing_bit_identical_to_gather():
    """frame_signal's hop-divisible slice path (round-3: the (T, n_fft)
    index gather compiles to ~10.8 MB of TPU code and runs 20x slower)
    must equal the librosa-strided reference EXACTLY for both the slice
    path (n_fft % hop == 0) and the gather fallback."""
    import jax.numpy as jnp

    from vae_hmc_tpu.ops.stft import frame_signal, num_frames

    rng = np.random.default_rng(5)
    y = rng.normal(size=(3, 5000)).astype(np.float32)
    for n_fft, hop in ((512, 128), (512, 96)):   # slice path / gather path
        got = np.asarray(frame_signal(jnp.asarray(y), n_fft, hop))
        pad = n_fft // 2
        yp = np.pad(y, ((0, 0), (pad, pad)), mode="reflect")
        t = num_frames(y.shape[1], n_fft, hop)
        ref = np.stack([yp[:, s * hop:s * hop + n_fft]
                        for s in range(t)], axis=1)
        np.testing.assert_array_equal(got, ref)
