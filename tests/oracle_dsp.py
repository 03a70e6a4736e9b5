"""Independent numpy/scipy oracle implementing librosa's documented DSP
semantics, used to parity-test the device kernels (librosa itself is not
installed in this environment).

Implements, straight from librosa's docs/source semantics (stft center=True
reflect padding, periodic hann, Slaney mel filterbank with slaney norm,
power_to_db with per-call ref/top_db, DCT-II ortho via scipy):
  - stft_power(y)      == |librosa.stft(y)|**p
  - melspectrogram(y)  == librosa.feature.melspectrogram(...)
  - power_to_db(S)     == librosa.power_to_db(...)
  - mfcc(y)            == librosa.feature.mfcc(...)
This file deliberately uses a different implementation route (scipy.fft,
scipy.fftpack.dct, python loops) than the JAX package so agreement is
meaningful.
"""
import numpy as np
import scipy.fft
import scipy.fftpack
import scipy.signal


def hann_periodic(n):
    return scipy.signal.get_window("hann", n, fftbins=True)


def stft_power(y, n_fft=2048, hop_length=512, power=2.0):
    y = np.asarray(y, dtype=np.float32)
    pad = n_fft // 2
    ypad = np.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + len(y) // hop_length
    win = hann_periodic(n_fft)
    out = np.empty((1 + n_fft // 2, n_frames), dtype=np.float64)
    for t in range(n_frames):
        seg = ypad[t * hop_length: t * hop_length + n_fft] * win
        out[:, t] = np.abs(scipy.fft.rfft(seg, n=n_fft)) ** power
    return out


def _hz_to_mel(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-12) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_mel = 1000.0 / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    1000.0 * np.exp(logstep * (m - min_log_mel)),
                    f_sp * m)


def mel_fb(sr, n_fft, n_mels=128, fmin=0.0, fmax=None):
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_f = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))
    weights = np.zeros((n_mels, len(fftfreqs)))
    for i in range(n_mels):
        lower = (fftfreqs - mel_f[i]) / (mel_f[i + 1] - mel_f[i])
        upper = (mel_f[i + 2] - fftfreqs) / (mel_f[i + 2] - mel_f[i + 1])
        weights[i] = np.maximum(0, np.minimum(lower, upper))
        weights[i] *= 2.0 / (mel_f[i + 2] - mel_f[i])
    return weights


def melspectrogram(y, sr=22050, n_fft=2048, hop_length=512, n_mels=128,
                   power=2.0, fmax=None):
    s = stft_power(y, n_fft, hop_length, power)
    return mel_fb(sr, n_fft, n_mels, fmax=fmax) @ s


def power_to_db(s, ref=1.0, amin=1e-10, top_db=80.0):
    if ref == "max":
        ref = np.max(s)
    log_spec = 10.0 * np.log10(np.maximum(amin, s))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def mfcc(y, sr=22050, n_mfcc=40, n_fft=2048, hop_length=512, n_mels=128):
    s = melspectrogram(y, sr, n_fft, hop_length, n_mels)
    db = power_to_db(s, ref=1.0, top_db=80.0)
    return scipy.fftpack.dct(db, axis=-2, type=2, norm="ortho")[:n_mfcc]


def mfcc_stats(y, sr=22050, n_mfcc=40, n_fft=2048, hop_length=512):
    m = mfcc(y, sr, n_mfcc, n_fft, hop_length)
    return np.concatenate([m.mean(axis=1), m.std(axis=1)]).astype(np.float32)


def logmel_db_ref_max(y, sr=22050, n_fft=2048, hop_length=512, n_mels=128,
                      top_db=None):
    s = melspectrogram(y, sr, n_fft, hop_length, n_mels)
    return power_to_db(s, ref="max", top_db=top_db)
