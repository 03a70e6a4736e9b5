"""End-to-end on a real on-disk corpus: wav files + manifest -> FileSource ->
native decode -> easy tier. Exercises io.audio, manifest path handling and
the skip-and-record error policy with actual files."""
import wave
from pathlib import Path

import numpy as np
import pytest

from vae_hmc_tpu.core.config import (DenseVaeConfig, KMeansConfig,
                                     MfccConfig, Workspace)
from vae_hmc_tpu.core.manifest import read_manifest, write_manifest
from vae_hmc_tpu.pipelines import easy, features
from vae_hmc_tpu.pipelines.sources import FileSource


def _write_wav(path, y, sr):
    path.parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(y, -1, 1) * 32767).astype("<i2").tobytes())


@pytest.fixture(scope="module")
def wav_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    sr = 22050
    rng = np.random.default_rng(0)
    rows = []
    for i in range(12):
        tid = 500 + i
        f0 = [220.0, 440.0, 880.0][i % 3]          # 3 "genres"
        t = np.arange(int(sr * 1.5)) / sr
        y = 0.4 * np.sin(2 * np.pi * f0 * t) + 0.02 * rng.standard_normal(len(t))
        p = root / "audio" / f"{tid}.wav"
        _write_wav(p, y, sr)
        txt = root / "text" / f"{tid}.txt"
        txt.parent.mkdir(parents=True, exist_ok=True)
        txt.write_text(f"lyrics for track {tid} la la " * 5)
        rows.append({"track_id": str(tid), "title": f"t{tid}",
                     "artist": "a", "genre": ["Rock", "Pop", "Folk"][i % 3],
                     "audio_path": str(p), "lyrics_path": str(txt),
                     "text_path_combined": str(txt), "text_exists": "True"})
    # one corrupt file: must be skipped-and-recorded, not crash
    bad = root / "audio" / "999.wav"
    bad.write_bytes(b"not a wav at all")
    rows.append({"track_id": "999", "title": "bad", "artist": "a",
                 "genre": "Rock", "audio_path": str(bad), "lyrics_path": "",
                 "text_path_combined": "", "text_exists": "False"})
    mp = root / "manifest.csv"
    write_manifest(mp, rows)
    return root, mp


def test_file_source_decode_and_features(wav_corpus):
    root, mp = wav_corpus
    source = FileSource.from_manifest(read_manifest(mp))
    assert len(source) == 13
    cfg = MfccConfig(duration_s=1.0)
    x, ids, report = features.build_mfcc_stats(source, cfg, device_batch=8)
    assert x.shape == (12, 80)                     # corrupt file skipped
    statuses = {r[0]: r[2] for r in report.rows}
    assert statuses[999] == "error"
    assert sum(1 for r in report.rows if r[2] == "ok") == 12


def test_file_source_easy_pipeline(wav_corpus, tmp_path):
    root, mp = wav_corpus
    ws = Workspace(tmp_path)
    source = FileSource.from_manifest(read_manifest(mp))
    out = easy.train_basic_vae(
        source, ws, MfccConfig(duration_s=1.0),
        DenseVaeConfig(latent_dim=4, epochs=2, batch_size=6),
        device_batch=8)
    assert out["latents"].shape == (12, 4)
    c = easy.cluster_easy(ws, KMeansConfig(n_clusters=3, n_init=3),
                          latents=out["latents"], track_ids=out["track_ids"])
    assert c["labels"].shape == (12,)
    assert (Path(tmp_path) / "results/kmeans_vae/labels_vae_kmeans.npy").exists()
    # quality check on the decoded features themselves (a 2-epoch VAE on 12
    # points is deliberately undertrained): 3 pure tone registers must be
    # perfectly separable from the native-decoded MFCCs
    from sklearn.metrics import adjusted_rand_score
    from vae_hmc_tpu.cluster.kmeans import kmeans_fit_predict
    from vae_hmc_tpu.ops.scaler import standardize
    truth = [i % 3 for i in range(12)]
    feat_labels = kmeans_fit_predict(np.asarray(standardize(out["features"])),
                                     3, n_init=5)
    assert adjusted_rand_score(feat_labels, truth) == pytest.approx(1.0)


def test_file_source_lyrics_text(wav_corpus):
    root, mp = wav_corpus
    source = FileSource.from_manifest(read_manifest(mp))
    assert "lyrics for track" in (source.lyrics_text(0) or "")
    assert source.lyrics_text(12) is None          # corrupt row has no text


def test_build_logmel_strict_fails_fast_and_nonstrict_skips(wav_corpus):
    """--strict raises on the first decode error (host-known, before any
    further batches run); non-strict skips-and-records.  Gates the
    features.BuildReport failure-detection contract (SURVEY.md §5)."""
    from vae_hmc_tpu.core.config import MelConfig

    root, mp = wav_corpus
    source = FileSource.from_manifest(read_manifest(mp))
    cfg = MelConfig(duration_s=1.0)
    with pytest.raises(RuntimeError, match="999"):
        features.build_logmel(source, cfg, device_batch=8, strict=True)
    x, ids, report = features.build_logmel(source, cfg, device_batch=8)
    assert x.shape[0] == 12 and 999 not in ids.tolist()
    assert {r[0]: r[2] for r in report.rows}[999] == "error"


def test_pipeline_features_match_oracle_chain(wav_corpus):
    """Pipeline-level oracle parity (VERDICT round-1 item): the SAME wav
    files through (a) the production path — native decode -> batched device
    MFCC-stats — and (b) a fully independent chain — python wave read ->
    tests/oracle_dsp (scipy librosa-semantics).  When a real corpus is
    mounted, real-data parity is a data swap, not a debugging session."""
    from tests import oracle_dsp

    root, mp = wav_corpus
    source = FileSource.from_manifest(read_manifest(mp))
    cfg = MfccConfig(duration_s=1.0)
    x, ids, _ = features.build_mfcc_stats(source, cfg, device_batch=8)

    sr = 22050
    n_target = int(sr * cfg.duration_s)
    for row, tid in ((0, 500), (7, 507)):
        assert ids[row] == tid
        with wave.open(str(root / "audio" / f"{tid}.wav"), "rb") as w:
            raw = w.readframes(w.getnframes())
            assert w.getframerate() == sr       # fixture is native-rate: the
        y = (np.frombuffer(raw, dtype="<i2")    # decode step itself is exact
             .astype(np.float32) / 32768.0)
        y = np.pad(y, (0, max(0, n_target - len(y))))[:n_target]
        m = oracle_dsp.mfcc(y, sr=sr, n_mfcc=cfg.n_mfcc, n_fft=cfg.n_fft,
                            hop_length=cfg.hop_length)
        want = np.concatenate([m.mean(axis=1), m.std(axis=1)])
        np.testing.assert_allclose(np.asarray(x[row]), want, atol=5e-2)
