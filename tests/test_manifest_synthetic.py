"""Manifest-backed synthetic-audio source (VERDICT r3 next-step #3).

The round-robin synthetic corpus never exercises the reference's REAL join
topology: skewed genre counts, non-contiguous track ids, and the
2,490-whisper/433-genius/1-both text-coverage mix of the committed manifest
(/root/reference/data/fma_manifest_combined_text_only_clean.csv).  These
tests pin (a) that dataset_from_manifest reproduces the real manifest's
statistics exactly, and (b) that the full medium tier runs end-to-end on a
manifest-backed source with ID-exact artifacts and the correct lyrics mask.
"""
from collections import Counter
from pathlib import Path

import numpy as np
import pytest

REF_MANIFEST = Path(
    "/root/reference/data/fma_manifest_combined_text_only_clean.csv")


@pytest.mark.skipif(not REF_MANIFEST.exists(),
                    reason="reference manifest not mounted")
def test_dataset_from_reference_manifest_statistics():
    from vae_hmc_tpu.pipelines.synthetic import dataset_from_manifest

    ds = dataset_from_manifest(REF_MANIFEST, seed=42)
    assert len(ds) == 2924
    # real genre skew (SURVEY.md §6), not the round-robin balance
    assert Counter(map(str, ds.genres)) == {
        "Folk": 494, "International": 492, "Hip-Hop": 487, "Pop": 487,
        "Rock": 486, "Experimental": 478}
    # real text-source mix
    assert Counter(ds.text_sources) == {
        "whisper": 2490, "genius": 433, "both": 1}
    # every committed row has text (text_exists all True)
    assert int(ds.has_lyrics.sum()) == 2924
    assert all(t is not None and len(t) >= 30 for t in ds.lyrics)
    # real, non-contiguous FMA track ids preserved in manifest order
    assert int(ds.track_ids[0]) == 64594
    assert len(np.unique(ds.track_ids)) == 2924
    diffs = np.diff(np.sort(ds.track_ids))
    assert (diffs > 1).any()


def _tiny_manifest(tmp_path: Path, n: int = 36, n_no_text: int = 5) -> Path:
    """First n rows of the real manifest, with text_exists flipped False on
    the first n_no_text rows so the missing-lyrics mask path is exercised
    (the committed manifest is all-True)."""
    import csv

    with open(REF_MANIFEST, newline="", encoding="utf-8") as f:
        reader = csv.DictReader(f)
        rows = [dict(r) for i, r in zip(range(n), reader)]
        fields = reader.fieldnames
    for r in rows[:n_no_text]:
        r["text_exists"] = "False"
        r["text_source_combined"] = ""
    p = tmp_path / "manifest.csv"
    with open(p, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)
    return p


@pytest.mark.skipif(not REF_MANIFEST.exists(),
                    reason="reference manifest not mounted")
def test_medium_tier_e2e_on_manifest_backed_source(tmp_path):
    """`run-medium --manifest <csv> --synthetic-audio` produces ID-exact
    artifacts and a lyrics mask equal to the manifest's text coverage —
    the real id-join topology of reference scripts 12:35-60 / 13:15-57."""
    from vae_hmc_tpu import cli

    n, n_no_text = 36, 5
    mp = _tiny_manifest(tmp_path, n, n_no_text)
    rc = cli.main([
        "run-medium", "--manifest", str(mp), "--synthetic-audio",
        "--epochs", "2", "--duration", "1.5", "--no-write-mel",
        "--root", str(tmp_path)])
    assert not rc

    import csv
    with open(mp, newline="", encoding="utf-8") as f:
        man_rows = list(csv.DictReader(f))
    man_ids = np.asarray([int(r["track_id"]) for r in man_rows])

    # audio artifacts are ID-exact, in manifest order
    a_ids = np.load(tmp_path / "data" / "audio_cnn_mel_track_ids.npy")
    np.testing.assert_array_equal(a_ids, man_ids)
    z_ids = np.load(tmp_path / "data" / "vae_mm_latents_track_ids.npy")
    np.testing.assert_array_equal(z_ids, man_ids)
    z = np.load(tmp_path / "data" / "vae_mm_latents_mu.npy")
    assert z.shape[0] == n and np.isfinite(z).all()

    # lyrics artifacts cover exactly the rows WITH text: found mask sum =
    # rows with text (the verdict's alignment/mask statistic)
    l_ids = np.load(tmp_path / "data" / "lyrics_track_ids.npy")
    with_text = [int(r["track_id"]) for r in man_rows
                 if r["text_exists"] == "True"]
    np.testing.assert_array_equal(l_ids, np.asarray(with_text))
    assert len(l_ids) == n - n_no_text

    # the embedding report records the skipped no-text rows
    report = (tmp_path / "results" / "lyrics_embedding_report.csv"
              ).read_text().splitlines()
    skipped = [ln for ln in report if ",skipped," in ln]
    assert len(skipped) == n_no_text

    # metrics CSV exists with the real genre labels flowing through ARI
    mets = (tmp_path / "results" / "medium_clustering_metrics_all.csv"
            ).read_text().splitlines()
    assert mets[0].startswith("representation,algo,params")
    assert len(mets) > 3


@pytest.mark.skipif(not REF_MANIFEST.exists(),
                    reason="reference manifest not mounted")
def test_hard_tier_e2e_on_manifest_backed_source(tmp_path):
    """run-hard --synthetic-audio: the hard prep (script 18) keeps the
    manifest's real ids and text coverage through the early-fusion path."""
    from vae_hmc_tpu import cli

    n, n_no_text = 24, 4
    mp = _tiny_manifest(tmp_path, n, n_no_text)
    rc = cli.main([
        "run-hard", "--manifest", str(mp), "--synthetic-audio",
        "--epochs", "2", "--duration", "1.5", "--root", str(tmp_path)])
    assert not rc

    import csv
    with open(mp, newline="", encoding="utf-8") as f:
        man_rows = list(csv.DictReader(f))
    man_ids = np.asarray([int(r["track_id"]) for r in man_rows])

    ids = np.load(tmp_path / "data" / "hard" / "track_ids.npy")
    np.testing.assert_array_equal(ids, man_ids)     # ID-exact, manifest order
    genres = np.load(tmp_path / "data" / "hard" / "genres.npy",
                     allow_pickle=True)
    np.testing.assert_array_equal(
        genres, np.asarray([r["genre"] for r in man_rows], dtype=object))
    # no-text rows embed as empty text and detect language "none"
    langs = np.load(tmp_path / "data" / "hard" / "languages.npy",
                    allow_pickle=True)
    assert (langs == "none").sum() == n_no_text
    z = np.load(tmp_path / "data" / "hard" / "latents_mu.npy")
    assert z.shape[0] == n and np.isfinite(z).all()
