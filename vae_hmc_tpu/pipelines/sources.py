"""Data sources feeding the feature pipelines.

A source abstracts "where waveforms and lyrics come from": the reference
reads mp3s through librosa per track (scripts 06:69, 10:149, 18:88); here a
source yields host-staged waveform *batches* that go straight to the device
kernels.  Implementations:

  - SyntheticSource: deterministic genre-structured signals (no audio files
    needed; see pipelines.synthetic);
  - FileSource: decodes audio files listed in a manifest through
    vae_hmc_tpu.io (wav native path; optional ffmpeg for mp3), preserving
    the reference's skip-on-error semantics (10:131-174).
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from vae_hmc_tpu.pipelines import synthetic


class Source:
    """Interface: ids/genres/lyrics + batched waveform access."""

    track_ids: np.ndarray
    genres: np.ndarray
    sample_rate: int = 22050

    def __len__(self):
        return len(self.track_ids)

    def lyrics_text(self, i: int) -> Optional[str]:
        raise NotImplementedError

    def waveforms(self, idx: Sequence[int], duration_s: float
                  ) -> Tuple[np.ndarray, np.ndarray, List[Optional[str]]]:
        """Return (batch (B, n_samples) float32 zero-padded, true sample
        lengths (B,) int32, per-row error strings or None)."""
        raise NotImplementedError


@dataclass
class SyntheticSource(Source):
    ds: synthetic.SyntheticDataset
    seed: int = 42
    device: bool = False   # True: synthesize on device (jax array batches) —
                           # the sample-level math never touches the host,
                           # which matters when host<->device bandwidth is
                           # the bottleneck (and it always beats 1-core numpy)

    def __post_init__(self):
        self.track_ids = self.ds.track_ids
        self.genres = self.ds.genres
        self.sample_rate = self.ds.sample_rate

    @property
    def supports_fused_synth(self) -> bool:
        """True when the feature builders may collapse this source's whole
        synth+feature stage into ONE scanned device program (the dispatch-
        count fix for congested links — see pipelines.features)."""
        return self.device

    def lyrics_text(self, i: int) -> Optional[str]:
        return self.ds.lyrics[i]

    def waveforms(self, idx, duration_s):
        if self.device:
            batch = synthetic.waveform_batch_device(self.ds, idx, duration_s,
                                                    self.seed)
        else:
            batch = synthetic.waveform_batch(self.ds, idx, duration_s,
                                             self.seed)
        n = batch.shape[-1]
        lengths = np.full(len(idx), n, dtype=np.int32)
        return batch, lengths, [None] * len(idx)

    @classmethod
    def make(cls, n_tracks: int = 2924, seed: int = 42,
             lyrics_coverage: float = 0.9,
             device: bool = False) -> "SyntheticSource":
        return cls(synthetic.make_dataset(n_tracks, seed, lyrics_coverage),
                   seed=seed, device=device)


@dataclass
class FileSource(Source):
    """Audio-file-backed source (manifest rows with audio_path)."""

    ids: np.ndarray
    genre_arr: np.ndarray
    paths: List[Path]
    texts: List[Optional[str]]
    sample_rate: int = 22050

    def __post_init__(self):
        self.track_ids = self.ids
        self.genres = self.genre_arr

    def lyrics_text(self, i: int) -> Optional[str]:
        return self.texts[i]

    def waveforms(self, idx, duration_s):
        from vae_hmc_tpu.io.audio import load_audio
        target = int(round(self.sample_rate * duration_s))
        out = np.zeros((len(idx), target), dtype=np.float32)
        lengths = np.zeros(len(idx), dtype=np.int32)
        errors: List[Optional[str]] = [None] * len(idx)
        for row, i in enumerate(idx):
            try:
                y = load_audio(self.paths[i], self.sample_rate,
                               max_duration_s=duration_s)
                n = min(len(y), target)
                out[row, :n] = y[:n]
                lengths[row] = n
            except Exception as e:  # skip-and-record (ref 10:167-174)
                errors[row] = f"{type(e).__name__}: {e}"
        return out, lengths, errors

    @classmethod
    def from_manifest(cls, manifest, root: Optional[Path] = None,
                      sample_rate: int = 22050) -> "FileSource":
        texts: List[Optional[str]] = []
        for p in manifest.text_paths(root):
            if p is not None and Path(p).exists():
                texts.append(Path(p).read_text(encoding="utf-8",
                                               errors="replace"))
            else:
                texts.append(None)
        return cls(ids=manifest.track_ids, genre_arr=manifest.genres,
                   paths=manifest.audio_paths(root), texts=texts,
                   sample_rate=sample_rate)
