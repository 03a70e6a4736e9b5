"""Acquisition stages 00-05 with stubbed network/ASR, on fabricated data."""
import zipfile
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from vae_hmc_tpu.core.config import Workspace
from vae_hmc_tpu.core.manifest import read_manifest
from vae_hmc_tpu.pipelines import acquisition as acq


def _fake_fma_tree(root: Path, n_per_genre=4, genres=("Rock", "Pop", "Folk")):
    """tracks.csv (multi-header) + mp3 stubs in the fma_small layout."""
    rows = []
    tid = 100
    for g in genres:
        for i in range(n_per_genre):
            rows.append((tid, f"title {tid}", f"artist {tid % 7}", g))
            tid += 2
    cols = pd.MultiIndex.from_tuples(
        [("set", "subset"), ("track", "title"), ("artist", "name"),
         ("track", "genre_top")])
    df = pd.DataFrame(
        [["small", t, a, g] for (_, t, a, g) in rows],
        index=[r[0] for r in rows], columns=cols)
    meta = root / "data" / "fma_metadata"
    meta.mkdir(parents=True)
    df.to_csv(meta / "tracks.csv")
    (meta / "genres.csv").write_text("genre_id,title\n1,Rock\n")
    audio_root = root / "data" / "fma_small"
    for (t, _, _, _) in rows:
        p = acq.build_audio_path(audio_root, t)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"\x00fake mp3")
    return [r[0] for r in rows]


def test_build_manifest_balanced(tmp_path):
    ws = Workspace(tmp_path)
    tids = _fake_fma_tree(tmp_path)
    m = acq.build_manifest(ws, total_tracks=9, n_genres=3, seed=42)
    assert len(m) == 9
    genres, counts = np.unique(m.genres, return_counts=True)
    assert list(counts) == [3, 3, 3]
    # deterministic: same seed -> same tracks
    m2 = acq.build_manifest(ws, total_tracks=9, n_genres=3, seed=42)
    assert list(m.track_ids) == list(m2.track_ids)


def test_build_manifest_skips_missing_audio(tmp_path):
    ws = Workspace(tmp_path)
    _fake_fma_tree(tmp_path, n_per_genre=4)
    # remove one mp3; the builder must skip it and still balance
    victims = list((tmp_path / "data" / "fma_small").rglob("*.mp3"))
    victims[0].unlink()
    m = acq.build_manifest(ws, total_tracks=9, n_genres=3, seed=42)
    assert len(m) == 9


def test_fetch_lyrics_chain_and_resume(tmp_path):
    ws = Workspace(tmp_path)
    _fake_fma_tree(tmp_path)
    acq.build_manifest(ws, total_tracks=9, n_genres=3, seed=42)

    calls = {"a": 0, "b": 0}

    def provider_a(artist, title):
        calls["a"] += 1
        return None                      # always misses

    def provider_b(artist, title):
        calls["b"] += 1
        return f"la la la {title} " * 10  # long enough

    res = acq.fetch_lyrics(ws, fetchers=[("genius", provider_a),
                                         ("lrclib", provider_b)],
                           sleep_seconds=0.0)
    assert res["fetched"] == 9
    m = read_manifest(ws.data / "fma_manifest_3k_6genres.csv")
    assert all(r["lyrics_source"] == "lrclib" for r in m.rows)
    assert all(Path(r["lyrics_path"]).exists() for r in m.rows)

    # resume: nothing refetched
    calls["b"] = 0
    res2 = acq.fetch_lyrics(ws, fetchers=[("lrclib", provider_b)],
                            sleep_seconds=0.0)
    assert res2["processed"] == 0 and calls["b"] == 0


def test_min_chars_filter(tmp_path):
    ws = Workspace(tmp_path)
    _fake_fma_tree(tmp_path)
    acq.build_manifest(ws, total_tracks=9, n_genres=3, seed=42)
    res = acq.fetch_lyrics(ws, fetchers=[("x", lambda a, t: "short")],
                           sleep_seconds=0.0)
    assert res["fetched"] == 0


def test_transcription_dry_run_and_stub(tmp_path):
    ws = Workspace(tmp_path)
    _fake_fma_tree(tmp_path)
    acq.build_manifest(ws, total_tracks=9, n_genres=3, seed=42)
    audit = acq.fetch_transcriptions(ws, dry_run=True)
    assert audit["rows_needing_transcription"] == 9
    assert audit["audio_found"] == 9
    res = acq.fetch_transcriptions(
        ws, transcriber=lambda p: f"transcript of {p.stem}")
    assert res["transcribed"] == 9


def test_combine_and_clean(tmp_path):
    ws = Workspace(tmp_path)
    _fake_fma_tree(tmp_path)
    acq.build_manifest(ws, total_tracks=9, n_genres=3, seed=42)
    acq.fetch_lyrics(ws, fetchers=[("genius", lambda a, t: "g " * 50)],
                     sleep_seconds=0.0, max_to_process=4)
    acq.fetch_transcriptions(ws, transcriber=lambda p: "w " * 50)
    # fabricate an overlap: a whisper transcript for one genius row (script 03
    # skips genius rows, so 'both' only happens via pre-existing files)
    m0 = read_manifest(ws.data / "fma_manifest_3k_6genres.csv")
    genius_row = next(r for r in m0.rows if r["lyrics_source"] == "genius")
    (ws.data / "whisper_transcriptions" /
     f"extra {genius_row['track_id']}.txt").write_text("w2 " * 50)
    counts = acq.combine_manifests(ws)
    assert counts["any"] == 9
    assert counts["genius"] == 4
    clean = acq.clean_manifest(ws)
    assert len(clean) == 9
    assert (ws.data / "fma_manifest_combined_text_only_clean.csv").exists()
    # combined text for genius+whisper rows uses the --- separator
    both_rows = [r for r in read_manifest(
        ws.data / "fma_manifest_combined_clean.csv").rows
        if r["text_source_combined"] == "genius+whisper"]
    assert both_rows
    text = Path(both_rows[0]["text_path_combined"]).read_text()
    assert "\n\n---\n\n" in text


def test_normalize_query():
    assert acq.normalize_query("Song (Live) [Remix]") == "Song"
    assert acq.normalize_query("  a   b  ") == "a b"


def test_default_whisper_transcriber_glue(monkeypatch, tmp_path):
    """Exercises the real default_whisper_transcriber code path (model
    load, load_audio, pad_or_trim, transcribe, text extraction) against a
    faithful fake `whisper` module — the heavy model itself is the only
    thing replaced.  Mirrors reference scripts/03:15-31 call sequence."""
    import sys
    import types

    calls = {}

    class _Model:
        def transcribe(self, audio):
            calls["transcribed"] = audio
            return {"text": "  hello from whisper  "}

    def _load_model(name):
        calls["model"] = name
        return _Model()

    def _load_audio(p):
        calls["loaded"] = p
        return [0.0] * 10

    def _pad_or_trim(a):
        calls["padded"] = len(a)
        return a

    fake = types.ModuleType("whisper")
    fake.load_model = _load_model
    fake.load_audio = _load_audio
    fake.pad_or_trim = _pad_or_trim
    monkeypatch.setitem(sys.modules, "whisper", fake)

    from vae_hmc_tpu.pipelines.acquisition import default_whisper_transcriber
    fn = default_whisper_transcriber()
    assert calls["model"] == "turbo"            # ref 03:15 model choice
    wav = tmp_path / "123.wav"
    wav.write_bytes(b"")
    assert fn(wav) == "hello from whisper"
    assert calls["loaded"] == str(wav)
    assert calls["padded"] == 10
