"""Feature-extraction drivers: source -> device kernels -> file contract.

Replaces the per-track librosa hot loops (reference scripts/06:92-141 MFCC,
10:113-190 log-mel, 18:160-196 hard prep) with device-batched extraction:
the host stages a (B, n_samples) waveform block, the fused STFT->mel->
(DCT->stats | dB) kernel runs on device, and results land in the same .npy /
report-CSV contract the reference writes.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vae_hmc_tpu.core.artifacts import save_csv_rows
from vae_hmc_tpu.core.config import MelConfig, MfccConfig
from vae_hmc_tpu.ops import mel as mel_ops
from vae_hmc_tpu.ops import mfcc as mfcc_ops
from vae_hmc_tpu.io.staging import batched_indices, prefetch_batches
from vae_hmc_tpu.ops.stft import pad_with_reflect_tail
from vae_hmc_tpu.pipelines import synthetic
from vae_hmc_tpu.pipelines.sources import Source


# ---------------------------------------------------------------------------
# Fused synth->feature scan programs (round-4, VERDICT r3 next-step #2).
#
# The batched feature loop costs 2 dispatches per batch (synth + kernel):
# ~92 for the 3k easy/hard MFCC stage at device_batch=64.  Each dispatch is
# ~0.5-1 s under tunnel congestion, so the SIMPLEST tier was the slowest
# (easy train_basic_vae: 14 s calm, 88-146 s congested).  For sources that
# synthesize on device, the whole stage is instead ONE program: a lax.scan
# over batches whose body synthesizes from tiny host params (~16 floats per
# track) and runs the feature kernel in place.  Program size stays that of
# a single batch body; waveforms are bit-identical to the per-batch path
# (same synth_core, same per-batch fold_in keys, threefry prefix property
# covers the padded tail batch).
# ---------------------------------------------------------------------------


def _stacked_synth_params(
    source, n: int, device_batch: int
) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """All-rows synth params reshaped (n_batches, B, ...) + batch starts."""
    p = synthetic.synth_param_arrays(source.ds, range(n), source.seed)
    pad = (-n) % device_batch
    if pad:
        p = {k: np.concatenate(
            [v, np.zeros((pad,) + v.shape[1:], v.dtype)]) for k, v in p.items()}
    nb = (n + pad) // device_batch
    p = {k: v.reshape((nb, device_batch) + v.shape[1:]) for k, v in p.items()}
    starts = (np.arange(nb) * device_batch).astype(np.int32)
    return p, starts


def _scan_synth(params, starts, seed: int, n_samples: int, sample_rate: int,
                feature_fn):
    """Shared scan skeleton: per batch, synthesize then apply feature_fn."""
    base = jax.random.PRNGKey(seed)

    def body(carry, inp):
        p, start = inp
        key = jax.random.fold_in(base, start)
        wav = synthetic.synth_core(
            p["amps"], p["freqs"], p["phases"], p["am_rate"], p["am_phase"],
            p["noise_lv"], key, n_samples, sample_rate)
        return carry, feature_fn(wav)

    _, feats = jax.lax.scan(body, None, (params, starts))
    return feats


@partial(jax.jit, static_argnames=("seed", "sample_rate", "cfg"))
def _synth_mfcc_program(params, starts, seed: int, sample_rate: int,
                        cfg: MfccConfig):
    feats = _scan_synth(params, starts, seed, cfg.n_samples, sample_rate,
                        lambda wav: mfcc_ops.mfcc_stats_batch(wav, cfg))
    return feats.reshape((-1, feats.shape[-1]))          # (N_pad, 2*n_mfcc)


@partial(jax.jit, static_argnames=("seed", "sample_rate", "cfg"))
def _synth_logmel_program(params, starts, seed: int, sample_rate: int,
                          cfg: MelConfig):
    def fn(wav):
        x = mel_ops.logmel_batch(wav, cfg)
        return (mel_ops.per_sample_standardize(x)
                if cfg.per_sample_standardize else x)

    feats = _scan_synth(params, starts, seed, cfg.n_samples, sample_rate, fn)
    return feats.reshape((-1,) + feats.shape[2:])        # (N_pad, mels, T)


@dataclass
class BuildReport:
    rows: List[Tuple]                    # (track_id, audio_path, status, reason)

    def ok_count(self) -> int:
        return sum(1 for r in self.rows if r[2] == "ok")

    def save(self, path: Path) -> Path:
        return save_csv_rows(path, ["track_id", "audio_path", "status", "reason"],
                             self.rows)


def build_mfcc_stats(
    source: Source,
    cfg: MfccConfig,
    device_batch: int = 64,
    strict: bool = False,
) -> Tuple[np.ndarray, np.ndarray, BuildReport]:
    """-> (X (N_ok, 2*n_mfcc) f32, track_ids (N_ok,), report).

    Easy preset (fixed-length pad, reference 06:56-89): every track padded /
    trimmed to duration_s, stats over all frames.
    Hard preset (min_duration_s>0, reference 18:73-97): tracks shorter than
    min_duration are skipped; stats are masked to true frame counts.
    """
    n = len(source)
    masked = cfg.min_duration_s > 0
    min_len = int(cfg.sample_rate * cfg.min_duration_s)
    if getattr(source, "supports_fused_synth", False):
        # whole stage as ONE scanned program (see module header): synthetic
        # clips are always full-length, so the masked/short-skip logic is
        # vacuous and plain stats == masked stats
        params, starts = _stacked_synth_params(source, n, device_batch)
        f_all = np.asarray(_synth_mfcc_program(
            params, starts, source.seed, source.sample_rate, cfg)[:n])
        feats_f, ids_f, rows_f = [], [], []
        for r in range(n):
            tid = int(source.track_ids[r])
            pstr = f"synthetic://{tid}"
            if not np.all(np.isfinite(f_all[r])):
                rows_f.append((tid, pstr, "error", "non_finite_features"))
                continue
            feats_f.append(f_all[r])
            ids_f.append(tid)
            rows_f.append((tid, pstr, "ok", ""))
        if not feats_f:
            raise RuntimeError("no tracks produced features")
        return (np.stack(feats_f).astype(np.float32),
                np.asarray(ids_f, dtype=np.int64), BuildReport(rows_f))
    # Per-batch results stay ON DEVICE; the stats and finite flags cross to
    # host in ONE concatenated fetch after the loop.  A per-batch
    # np.asarray here serializes the pipeline into ~46 blocking tunnel
    # round-trips at 3k tracks (the same finding that took build_logmel
    # from 177.7 s to 16.4 s — VALIDATION.md).
    f_parts, meta = [], []            # meta: (tid, pstr, err, length)
    # background host decode overlaps device compute (io.staging)
    for idx, payload in prefetch_batches(
            lambda ix: source.waveforms(ix, cfg.duration_s),
            batched_indices(n, device_batch)):
        batch, lengths, errors = payload
        if strict:
            for r, e in enumerate(errors):
                if e is not None:
                    raise RuntimeError(
                        f"track {int(source.track_ids[idx[r]])}: {e}")
        if masked and int(np.min(lengths)) < cfg.n_samples:
            # keep true lengths: short clips are NOT padded into the stats
            # (reference 18:88 loads duration<=20 s at true length); the
            # reflect tail makes boundary frames exact (see ops.stft).
            batch = np.asarray(batch)
            staged = np.stack([
                pad_with_reflect_tail(batch[r, :max(int(lengths[r]), 2)],
                                      cfg.n_samples, cfg.n_fft)
                for r in range(len(idx))
            ])
            f = mfcc_ops.mfcc_stats_batch(
                jnp.asarray(staged), cfg, lengths=jnp.asarray(lengths))
        else:
            # all clips full-length: masked stats == plain stats
            f = mfcc_ops.mfcc_stats_batch(jnp.asarray(batch), cfg)
        f_parts.append(f)
        path = getattr(source, "paths", None)
        meta.extend(
            (int(source.track_ids[i]),
             (str(path[i]) if path is not None
              else f"synthetic://{int(source.track_ids[i])}"),
             errors[r], int(lengths[r]))
            for r, i in enumerate(idx))
    if not f_parts:
        raise RuntimeError("no tracks produced features")
    f_all = np.asarray(jnp.concatenate(f_parts))             # ONE fetch
    feats, ids, rows = [], [], []
    for r, (tid, pstr, err, length) in enumerate(meta):
        if err is not None:
            rows.append((tid, pstr, "error", err))
            continue
        if masked and length < min_len:            # <1 s skip (ref 18:88)
            rows.append((tid, pstr, "skipped", "too_short"))
            continue
        if not np.all(np.isfinite(f_all[r])):
            rows.append((tid, pstr, "error", "non_finite_features"))
            continue
        feats.append(f_all[r])
        ids.append(tid)
        rows.append((tid, pstr, "ok", ""))
    if not feats:
        raise RuntimeError("no tracks produced features")
    return (np.stack(feats).astype(np.float32),
            np.asarray(ids, dtype=np.int64), BuildReport(rows))


def build_logmel(
    source: Source,
    cfg: MelConfig,
    device_batch: int = 32,
    strict: bool = False,
    hbm_resident: bool = False,
) -> Tuple[np.ndarray, np.ndarray, BuildReport]:
    """-> (X, ids, report).

    Reproduces reference scripts/10: fixed 15 s pad/trim, log-mel dB with
    per-sample ref=max, per-sample standardization, T locked by config
    (the reference locks T to the first processed sample, 10:113-156 — with
    static framing T is deterministic: 1 + n_samples // hop).

    hbm_resident=False (file-contract mode): X is a host (N_ok, 1, mels, T)
    numpy array — one device->host fetch per batch, as the .npy write needs.
    hbm_resident=True: X is a DEVICE (N_ok, mels, T) array; only the per-
    track finite flags (a few bytes/track) cross back to host.  The ~1 GB
    feature tensor then feeds training/clustering in place — on hosts with
    slow device readback the per-batch fetches are the single largest cost
    of the medium tier.
    """
    n = len(source)
    paths = getattr(source, "paths", None)

    def _pstr(i):
        return (str(paths[i]) if paths is not None
                else f"synthetic://{int(source.track_ids[i])}")

    if getattr(source, "supports_fused_synth", False):
        # whole stage as ONE scanned program (see module header)
        params, starts = _stacked_synth_params(source, n, device_batch)
        X = _synth_logmel_program(params, starts, source.seed,
                                  source.sample_rate, cfg)[:n]
        finite = np.asarray(jax.jit(
            lambda a: jnp.all(jnp.isfinite(a), axis=(1, 2)))(X))
        ids_f, rows_f, keep_f = [], [], []
        for r in range(n):
            tid = int(source.track_ids[r])
            if not finite[r]:
                rows_f.append((tid, _pstr(r), "error", "non_finite_features"))
                continue
            keep_f.append(r)
            ids_f.append(tid)
            rows_f.append((tid, _pstr(r), "ok", ""))
        if not keep_f:
            raise RuntimeError("no tracks produced features")
        if len(keep_f) != n:
            X = jnp.take(X, jnp.asarray(keep_f), axis=0)
        if not hbm_resident:
            X = np.asarray(X)[:, None, :, :].astype(np.float32)
        return X, np.asarray(ids_f, dtype=np.int64), BuildReport(rows_f)

    feats, finite_parts, meta = [], [], []   # meta: (tid, pstr, err-or-None)
    for idx, payload in prefetch_batches(
            lambda ix: source.waveforms(ix, cfg.duration_s),
            batched_indices(n, device_batch)):
        batch, lengths, errors = payload
        # decode errors are host-known from the prefetcher: fail fast under
        # strict, and drop those rows per batch (cheap; keeps error rows out
        # of the retained tensor so the final non-finite filter is a no-op
        # copy in the common all-finite case)
        if strict:
            for r, e in enumerate(errors):
                if e is not None:
                    raise RuntimeError(
                        f"track {int(source.track_ids[idx[r]])}: {e}")
        x = mel_ops.logmel_batch(jnp.asarray(batch), cfg)
        if cfg.per_sample_standardize:
            x = mel_ops.per_sample_standardize(x)
        keep = [r for r, e in enumerate(errors) if e is None]
        if len(keep) != len(idx):
            x = jnp.take(x, jnp.asarray(keep), axis=0)
        if len(keep):
            # finite flags stay ON DEVICE until after the loop: fetching
            # them per batch forces a blocking host round-trip per dispatch
            # (~46 pipeline syncs for the 3k corpus on a tunneled dev host)
            finite_parts.append(jnp.all(jnp.isfinite(x), axis=(1, 2)))
            feats.append(x if hbm_resident else np.asarray(x))
        meta.extend((int(source.track_ids[i]), _pstr(i), errors[r])
                    for r, i in enumerate(idx))
    if not feats:
        raise RuntimeError("no tracks produced features")
    finite = np.asarray(jnp.concatenate(finite_parts))       # ONE small fetch
    ids, rows, keep_pos = [], [], []
    p = 0                        # position in the concatenated non-error rows
    for tid, pstr, err in meta:
        if err is not None:
            rows.append((tid, pstr, "error", err))
            continue
        if not finite[p]:
            rows.append((tid, pstr, "error", "non_finite_features"))
        else:
            keep_pos.append(p)
            ids.append(tid)
            rows.append((tid, pstr, "ok", ""))
        p += 1
    if not keep_pos:
        raise RuntimeError("no tracks produced features")
    if hbm_resident:
        X = jnp.concatenate(feats, axis=0)                   # (N, mels, T)
        if len(keep_pos) != p:
            X = jnp.take(X, jnp.asarray(keep_pos), axis=0)
    else:
        X = np.concatenate(feats, axis=0)
        if len(keep_pos) != p:
            X = X[np.asarray(keep_pos)]
        X = X[:, None, :, :].astype(np.float32)
    return X, np.asarray(ids, dtype=np.int64), BuildReport(rows)
