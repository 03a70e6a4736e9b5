"""Batched STFT / power spectrogram on device.

The reference computes spectrograms one track at a time through librosa's
numba/scipy CPU path (reference scripts/06:80, 10:55-66, 18:90).  Here the
whole waveform batch lives in HBM and the framing -> window -> rFFT -> |.|^2
chain is one jitted XLA program: framing is a static gather XLA turns into
strided slices, the FFT runs on-device, and everything downstream (mel matmul,
log) fuses behind it.  Semantics follow librosa's stft defaults so feature
parity holds: center=True reflect padding, periodic Hann window of n_fft.

Static shapes only: (batch, n_samples) in, (batch, n_freq, n_frames) out.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann (scipy.signal.get_window('hann', n, fftbins=True))."""
    k = np.arange(n)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)
    return jnp.asarray(w, dtype=dtype)


def num_frames(n_samples: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    if center:
        return 1 + n_samples // hop_length
    return 1 + (n_samples - n_fft) // hop_length


def frame_signal(
    y: jax.Array,
    n_fft: int,
    hop_length: int,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """(B, L) -> (B, T, n_fft) frames, librosa centering semantics."""
    if y.ndim != 2:
        raise ValueError(f"expected (batch, samples), got {y.shape}")
    b, n = y.shape
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
    t = num_frames(n, n_fft, hop_length, center)
    if n_fft % hop_length == 0:
        # Slice framing: every frame start is hop-aligned, so frame t is
        # the concatenation of r = n_fft/hop consecutive hop-blocks — r
        # static slices of a (B, nb, hop) reshape.  The (T, n_fft)-index
        # gather this replaces compiles to ~10.8 MB of TPU code at 30 s /
        # 2048 / 512 (code size scales with T) and runs 20x slower; the
        # slice form is 0.23 MB and bit-identical (round-3 code-size
        # finding, tools/profile_viz_programs.py; tests/test_dsp_parity).
        r = n_fft // hop_length
        need = (t - 1) * hop_length + n_fft       # hop-divisible: r | n_fft
        blocks = y[:, :need].reshape(y.shape[0], need // hop_length,
                                     hop_length)
        return jnp.concatenate([blocks[:, i:i + t, :] for i in range(r)],
                               axis=2)                         # (B, T, n_fft)
    # general hop: static gather (XLA turns iota-based gathers into
    # dynamic slices only for 1-D index patterns — see above for why the
    # 2-D form is avoided when possible)
    starts = np.arange(t) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]          # (T, n_fft)
    return y[:, jnp.asarray(idx)]                              # (B, T, n_fft)


def _dft_matrices(n_fft: int, dtype=jnp.float32):
    """On-device rDFT basis: (n_fft, F) cos and sin matrices, F = n_fft//2+1.

    Built INSIDE the program from an int32 iota outer product so that (a) no
    multi-MB matrix constant is embedded in the executable (round-3/4
    code-size hazard: per-process executable LOAD through the dev tunnel is
    ~0.3-1 MB/s) and (b) the angle is exactly reduced mod n_fft in integer
    arithmetic before the float multiply — t*f <= n_fft^2/2 < 2^23 is exact
    in int32 and the reduced angle is in [0, 2pi), so cos/sin see no
    large-argument cancellation.
    """
    t = jax.lax.iota(jnp.int32, n_fft)[:, None]                # time index
    f = jax.lax.iota(jnp.int32, n_fft // 2 + 1)[None, :]       # freq index
    tf = (t * f) % n_fft
    ang = tf.astype(dtype) * jnp.asarray(2.0 * np.pi / n_fft, dtype)
    return jnp.cos(ang), jnp.sin(ang)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "pad_mode", "power", "method"))
def power_spectrogram(
    y: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 512,
    center: bool = True,
    pad_mode: str = "reflect",
    power: float = 2.0,
    method: str = "dft",
) -> jax.Array:
    """(B, L) waveforms -> (B, 1 + n_fft//2, T) |STFT|^power.

    method="dft" (default): the rFFT is computed as two MXU matmuls against
    on-device cos/sin DFT matrices (precision=HIGHEST — the contraction is
    cancellation-sensitive).  XLA's TPU FFT lowering is code-heavy and every
    fresh process re-loads executables through the dev tunnel at ~0.3-1 MB/s
    (round-3 CODE-SIZE HAZARD).  Measured round 4 at the MFCC production
    shape (64, 1292, 2048): the scanned mfcc_stats program is 5.56 MB with
    the DFT form vs 6.99 MB with native FFT (the DFT stage alone compiles to
    ~2.4 MB, near the matmul tiling floor — barriers, fused cos|sin, T-block
    scans and layout changes were all measured and did not beat it), at
    equal exec time (2.15 s vs 2.12 s for 2,924 tracks).  method="fft"
    keeps the native FFT for cross-checks; both agree to f32 roundoff
    (tests/test_dsp_parity.py gates both against the scipy oracle).
    """
    if method not in ("dft", "fft"):
        # method is a static jit argname: a typo would otherwise silently
        # take the FFT branch AND compile a separate program per misspelling
        raise ValueError(f"method must be 'dft' or 'fft', got {method!r}")
    frames = frame_signal(y, n_fft, hop_length, center, pad_mode)
    frames = frames * hann_window(n_fft, frames.dtype)
    if method == "dft":
        cos_m, sin_m = _dft_matrices(n_fft, frames.dtype)
        re = jnp.matmul(frames, cos_m, precision=jax.lax.Precision.HIGHEST)
        im = jnp.matmul(frames, sin_m, precision=jax.lax.Precision.HIGHEST)
        p2 = re * re + im * im                                 # (B, T, F)
        if power == 2.0:
            mag = p2
        elif power == 1.0:
            mag = jnp.sqrt(p2)
        else:
            mag = p2 ** (power / 2.0)
    else:
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)          # (B, T, F)
        mag = jnp.abs(spec)
        if power != 1.0:
            mag = mag ** power
    return jnp.swapaxes(mag, -1, -2)                           # (B, F, T)


def pad_with_reflect_tail(y: np.ndarray, target_len: int, n_fft: int) -> np.ndarray:
    """Stage a variable-length track into a fixed (target_len,) buffer for the
    masked-stats path: zero-pad, but write the first n_fft//2 padded samples as
    the np.pad 'reflect' continuation of the signal.  This makes the frames
    near the track's true end identical to librosa's center=True reflect
    padding of the *unpadded* signal (hard tier, reference scripts/18:88: clips
    are loaded at true length, not padded), so masked stats are exact rather
    than approximately right at the boundary.
    """
    y = np.asarray(y)
    n = y.shape[-1]
    if n >= target_len:
        return y[..., :target_len]
    out = np.zeros(y.shape[:-1] + (target_len,), dtype=y.dtype)
    out[..., :n] = y
    p = min(n_fft // 2, target_len - n, n - 1)
    if p > 0:
        out[..., n:n + p] = y[..., n - 2:n - 2 - p:-1] if n - 2 - p >= 0 \
            else y[..., n - 2::-1][..., :p]
    return out


def pad_or_trim(y: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Zero-pad at the end / truncate to target length (reference
    scripts/06:74-78, 10:35-40 semantics). Host-side helper; static shapes."""
    y = np.asarray(y)
    n = y.shape[-1]
    if n >= target_len:
        return y[..., :target_len]
    pad = [(0, 0)] * (y.ndim - 1) + [(0, target_len - n)]
    return np.pad(y, pad, mode="constant")
