"""Native C++ components: audio io + ward, vs python references."""
import wave
from pathlib import Path

import numpy as np
import pytest
from sklearn.cluster import AgglomerativeClustering
from sklearn.metrics import adjusted_rand_score


def _write_wav(path: Path, y: np.ndarray, sr: int, channels: int = 1):
    x = (np.clip(y, -1, 1) * 32767).astype("<i2")
    if channels == 2:
        x = np.stack([x, x], axis=1).reshape(-1)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


@pytest.fixture(scope="module")
def native_audio():
    from vae_hmc_tpu.io import native
    try:
        native.get_lib()
    except Exception as e:
        pytest.skip(f"native audio build unavailable: {e}")
    return native


def test_native_wav_roundtrip(tmp_path, native_audio, rng):
    sr = 22050
    t = np.arange(sr) / sr
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    _write_wav(tmp_path / "a.wav", y, sr)
    out = native_audio.load_wav_native(tmp_path / "a.wav", sr)
    assert out.shape == (sr,)
    np.testing.assert_allclose(out, y, atol=1e-3)


def test_native_wav_stereo_downmix(tmp_path, native_audio):
    sr = 8000
    y = np.sin(2 * np.pi * 100 * np.arange(sr) / sr).astype(np.float32)
    _write_wav(tmp_path / "s.wav", y, sr, channels=2)
    out = native_audio.load_wav_native(tmp_path / "s.wav", sr)
    np.testing.assert_allclose(out, y, atol=2e-3)


def test_native_resample_tone(native_audio):
    """44.1k -> 22.05k of a 1 kHz tone must stay a clean 1 kHz tone."""
    sr_in, sr_out = 44100, 22050
    t = np.arange(sr_in) / sr_in
    y = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    out = native_audio.resample_native(y, sr_in, sr_out)
    assert abs(len(out) - sr_out) <= 1
    # compare interior against the ideal tone (edges have filter ramp-in)
    t2 = np.arange(len(out)) / sr_out
    ref = np.sin(2 * np.pi * 1000 * t2)
    seg = slice(500, len(out) - 500)
    err = np.sqrt(np.mean((out[seg] - ref[seg]) ** 2))
    assert err < 0.01, f"resample RMS error {err}"


def test_load_audio_wav_path(tmp_path):
    from vae_hmc_tpu.io.audio import load_audio
    sr = 22050
    y = np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr).astype(np.float32)
    _write_wav(tmp_path / "b.wav", y, sr)
    out = load_audio(tmp_path / "b.wav", sr, max_duration_s=1.0)
    assert out.shape == (sr,)
    np.testing.assert_allclose(out, y[:sr], atol=1e-3)


def test_native_ward_matches_numpy_and_sklearn(rng):
    from vae_hmc_tpu.cluster import agglomerative as agg
    try:
        from vae_hmc_tpu.cluster.native import ward_nn_chain_native
        from vae_hmc_tpu.metrics.internal import pairwise_sq_dists
    except Exception as e:
        pytest.skip(f"native ward unavailable: {e}")
    centers = rng.normal(0, 5, (4, 6))
    y = rng.integers(0, 4, 120)
    x = (centers[y] + rng.normal(0, 1.0, (120, 6))).astype(np.float32)
    d2 = np.asarray(pairwise_sq_dists(x), dtype=np.float64)
    try:
        native_merges = ward_nn_chain_native(d2.copy())
    except RuntimeError as e:
        pytest.skip(f"native ward build failed: {e}")
    numpy_merges = agg._ward_nn_chain_numpy(x)
    # merge ids can permute between equal-distance merges (tie order);
    # distances, sizes and the induced clustering must agree exactly
    np.testing.assert_allclose(native_merges[:, 2], numpy_merges[:, 2],
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.sort(native_merges[:, 3]),
                               np.sort(numpy_merges[:, 3]))
    labels = agg.cut_tree_n_clusters(native_merges, 120, 4)
    labels_np = agg.cut_tree_n_clusters(numpy_merges, 120, 4)
    sk = AgglomerativeClustering(n_clusters=4, linkage="ward").fit_predict(x)
    assert adjusted_rand_score(labels, labels_np) == pytest.approx(1.0)
    assert adjusted_rand_score(labels, sk) == pytest.approx(1.0)
