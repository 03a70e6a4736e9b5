"""First-party (in-process) mp3 decode tests.

The FMA corpus is 100% mp3 (reference scripts/01:33-35 builds .mp3 paths;
librosa.load decodes them via audioread's external-decoder chain).  Our
native path decodes in process — libmpg123 dlopen'd by io/native/audioio.cpp
— with no per-file subprocess.

The strongest available oracle with zero egress: ENCODE a known tone with
libmp3lame (present on this image), decode it back through our native path,
and require the waveform to survive the lossy round trip (correlation,
RMS, dominant frequency).  A wrong mpg123 constant, a channel-interleave
bug, or a broken resample hand-off all destroy the tone.
"""
import ctypes
import ctypes.util
from pathlib import Path

import numpy as np
import pytest

SR = 22050
F0 = 440.0


def _find_lame():
    for name in ("libmp3lame.so.0", "libmp3lame.so"):
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def _mpg123_available() -> bool:
    for name in ("libmpg123.so.0", "libmpg123.so"):
        try:
            ctypes.CDLL(name)
            return True
        except OSError:
            continue
    return False


needs_codecs = pytest.mark.skipif(
    _find_lame() is None or not _mpg123_available(),
    reason="libmp3lame/libmpg123 not on this host")


def _encode_mp3(path: Path, y: np.ndarray, sr: int,
                channels: int = 1) -> None:
    """Minimal CBR mp3 encode via libmp3lame (test-only oracle encoder)."""
    lame = _find_lame()
    lame.lame_init.restype = ctypes.c_void_p
    gfp = ctypes.c_void_p(lame.lame_init())
    for setter, val in (("lame_set_in_samplerate", sr),
                        ("lame_set_out_samplerate", sr),
                        ("lame_set_num_channels", channels),
                        ("lame_set_brate", 128),
                        ("lame_set_quality", 2),
                        ("lame_set_mode", 3 if channels == 1 else 1)):
        getattr(lame, setter)(gfp, val)
    assert lame.lame_init_params(gfp) >= 0
    pcm = np.clip(y * 32767.0, -32768, 32767).astype(np.int16)
    if channels == 2:
        left = np.ascontiguousarray(pcm[:, 0])
        right = np.ascontiguousarray(pcm[:, 1])
        n = len(left)
    else:
        left = right = np.ascontiguousarray(pcm)
        n = len(pcm)
    cap = int(1.25 * n * channels * 2 + 7200)
    out = np.zeros(cap, dtype=np.uint8)
    wrote = lame.lame_encode_buffer(
        gfp, left.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        right.ctypes.data_as(ctypes.POINTER(ctypes.c_short)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), cap)
    assert wrote >= 0
    tail = np.zeros(7200, dtype=np.uint8)
    wrote2 = lame.lame_encode_flush(
        gfp, tail.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), 7200)
    assert wrote2 >= 0
    data = bytes(out[:wrote]) + bytes(tail[:wrote2])
    # overwrite the placeholder Xing/Info frame so mpg123 gapless trimming
    # knows the encoder delay/padding (standard lame finalize step)
    if hasattr(lame, "lame_get_lametag_frame"):
        tag = np.zeros(4096, dtype=np.uint8)
        lame.lame_get_lametag_frame.restype = ctypes.c_size_t
        tn = lame.lame_get_lametag_frame(
            gfp, tag.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), 4096)
        if 0 < tn <= len(data):
            data = bytes(tag[:tn]) + data[tn:]
    lame.lame_close(gfp)
    path.write_bytes(data)


def _best_corr(a: np.ndarray, b: np.ndarray, max_shift: int = 4000):
    """Max normalized cross-correlation of b against a over +-max_shift."""
    best = -1.0
    n = min(len(a), len(b))
    m = n - max_shift
    assert m > 1000
    a0 = a[:m] - a[:m].mean()
    for s in range(0, max_shift, 4):
        bs = b[s: s + m] - b[s: s + m].mean()
        c = float(np.dot(a0, bs)
                  / max(np.linalg.norm(a0) * np.linalg.norm(bs), 1e-12))
        best = max(best, c)
    return best


@pytest.fixture(scope="module")
def tone():
    t = np.arange(int(2.0 * SR)) / SR
    return (0.6 * np.sin(2 * np.pi * F0 * t)).astype(np.float32)


@needs_codecs
def test_mono_roundtrip_tone(tmp_path_factory, tone):
    from vae_hmc_tpu.io.native import load_mp3_native
    p = tmp_path_factory.mktemp("mp3") / "tone.mp3"
    _encode_mp3(p, tone, SR, channels=1)
    y = load_mp3_native(p, SR)
    assert y.dtype == np.float32
    assert abs(len(y) - len(tone)) < 0.1 * len(tone)
    assert np.isfinite(y).all()
    rms_in = float(np.sqrt(np.mean(tone**2)))
    rms_out = float(np.sqrt(np.mean(y**2)))
    # vs the PRE-ENCODE source (stricter than decoder-vs-decoder parity):
    # lame itself bakes a ~0.95 gain into the stream, so ~5% RMS slack;
    # waveform fidelity is held by the 0.97 correlation + pitch checks
    assert abs(rms_out - rms_in) / rms_in < 0.07
    assert _best_corr(tone, y) > 0.97
    # dominant frequency must be the tone
    spec = np.abs(np.fft.rfft(y[: SR]))
    peak_hz = np.argmax(spec) * SR / SR
    assert abs(peak_hz - F0) < 3.0


@needs_codecs
def test_stereo_downmix_and_duration_cap(tmp_path_factory, tone):
    from vae_hmc_tpu.io.native import load_mp3_native
    stereo = np.stack([tone, 0.5 * tone], axis=1)
    p = tmp_path_factory.mktemp("mp3") / "stereo.mp3"
    _encode_mp3(p, stereo, SR, channels=2)
    y = load_mp3_native(p, SR)
    # mono downmix = channel mean -> amplitude 0.75 * 0.6
    expected_rms = float(np.sqrt(np.mean((0.75 * tone) ** 2)))
    rms = float(np.sqrt(np.mean(y**2)))
    assert abs(rms - expected_rms) / expected_rms < 0.06
    assert _best_corr(tone, y) > 0.97
    y_cap = load_mp3_native(p, SR, max_seconds=0.5)
    assert len(y_cap) == int(0.5 * SR)


@needs_codecs
def test_resample_path_preserves_pitch(tmp_path_factory, tone):
    """Decode at a different target rate: the sinc resampler hand-off must
    keep the tone at 440 Hz."""
    from vae_hmc_tpu.io.native import load_mp3_native
    p = tmp_path_factory.mktemp("mp3") / "tone2.mp3"
    _encode_mp3(p, tone, SR, channels=1)
    sr2 = 16000
    y = load_mp3_native(p, sr2)
    assert abs(len(y) - 2.0 * sr2) < 0.1 * 2.0 * sr2
    spec = np.abs(np.fft.rfft(y[:sr2]))
    assert abs(int(np.argmax(spec)) - F0) < 3.0


@needs_codecs
def test_load_audio_dispatches_mp3_natively(tmp_path_factory, tone):
    """The public io.audio.load_audio surface must route .mp3 through the
    in-process decoder (no subprocess) — this host has no ffmpeg, so a
    fallback to the pipe would raise."""
    from vae_hmc_tpu.io.audio import load_audio
    p = tmp_path_factory.mktemp("mp3") / "tone3.mp3"
    _encode_mp3(p, tone, SR, channels=1)
    y = load_audio(p, SR, max_duration_s=1.0)
    assert len(y) == SR
    assert _best_corr(tone[:SR], y, max_shift=2000) > 0.9


@pytest.mark.skipif(
    not Path("/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
             "test_data/test.mp3").exists() or not _mpg123_available(),
    reason="no sample mp3 on this host")
def test_real_world_mpeg2_file_decodes():
    """A real LAME-encoded MPEG-2 LSF Layer III file (different header
    family than MPEG-1): must decode deterministically with finite output."""
    from vae_hmc_tpu.io.native import load_mp3_native
    p = Path("/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
             "test_data/test.mp3")
    y1 = load_mp3_native(p, 22050)
    y2 = load_mp3_native(p, 22050)
    assert len(y1) > 1000
    assert np.isfinite(y1).all()
    np.testing.assert_array_equal(y1, y2)
