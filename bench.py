"""End-to-end benchmark: mel features -> conv multimodal VAE -> KMeans.

Runs the medium-tier headline path (BASELINE.json metric: "tracks/sec
end-to-end (mel->VAE->KMeans) on FMA-small-3k; ARI + silhouette parity") on
the real device at full scale: 2,924 tracks, 15 s @ 22.05 kHz, (128, 646)
log-mel images, 25-epoch conv-MM-VAE training, KMeans(k=6, n_init=10) +
silhouette/DBI/ARI.

The FMA mp3s are not available in this environment, so audio comes from the
deterministic genre-structured synthesizer (vae_hmc_tpu.pipelines.synthetic)
with sample-level synthesis on device standing in for the decode stage.
The timed region covers everything downstream of "waveforms exist":
feature extraction, lyrics embedding, training, latent export, clustering
and metrics — the stages the reference runs through librosa/torch/sklearn.

Reference baseline estimate (no published numbers exist — SURVEY.md §6):
per-track librosa mel ~0.1 s x 2924 + 25 torch epochs + sklearn suite
=> realistically >= 10 min end-to-end, i.e. ~5 tracks/sec. vs_baseline is
reported against that 5 tracks/sec estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
from __future__ import annotations

import json
import os
import sys
import time


import jax
import jax.numpy as jnp
import numpy as np

# persistent XLA compilation cache: the whole pipeline is a handful of
# static-shape programs, so every run after the first skips compilation
# (the dominant cost on a cold chip: the fused train program alone is
# minutes of XLA time, while its steady-state step is ~1 ms)
from vae_hmc_tpu.core.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main() -> None:
    n_tracks = int(os.environ.get("BENCH_N_TRACKS", "2924"))
    from vae_hmc_tpu.cluster.kmeans import kmeans
    from vae_hmc_tpu.core import backend as backend_mod
    from vae_hmc_tpu.core.config import (ConvMMVaeConfig, KMeansConfig,
                                         MelConfig)
    from vae_hmc_tpu.metrics import external, internal
    from vae_hmc_tpu.models import api as model_api
    from vae_hmc_tpu.ops import mel as mel_ops
    from vae_hmc_tpu.pipelines import synthetic
    from vae_hmc_tpu.text.embed import hashed_embedding

    # Outage-proofing (round-3 post-mortem): jax.devices() HANGS during a
    # tunnel outage, which voided round 3's driver bench.  Probe the backend
    # in a bounded subprocess with backoff before touching it in-process; on
    # a dead backend, emit a structured error JSON that points at the last
    # committed in-round result instead of hanging/crashing bare.
    budget = float(os.environ.get("BENCH_BACKEND_TIMEOUT", "600"))
    status = backend_mod.wait_for_backend(
        total_budget_s=budget,
        log=lambda m: print(f"[bench] {m}", file=sys.stderr, flush=True))
    if not status.ok:
        err = {
            "metric": "tracks/sec end-to-end (mel->VAE->KMeans) on FMA-small-3k",
            "value": None,
            "unit": "tracks/sec",
            "vs_baseline": None,
            "error": f"backend unavailable after {status.seconds_waited:.0f}s"
                     f" / {status.attempts} probes: {status.error}",
            "last_known_good": backend_mod.last_known_good(),
        }
        print(json.dumps(err))
        sys.exit(1)
    dev = jax.devices()[0]
    print(f"[bench] device: {dev.device_kind} ({dev.platform}); backend "
          f"ready after {status.attempts} probe(s), "
          f"{status.seconds_waited:.1f}s", file=sys.stderr)

    # Pallas compiled-on-device smoke + parity (outside the timed region):
    # both custom kernels execute COMPILED on this chip every bench run and
    # must match the XLA production paths.  Production uses the XLA paths
    # because they won the on-chip benchmark at parity-grade precision
    # (VALIDATION.md round-2 table); this guard keeps the kernels honest.
    pallas_smoke = "skipped (cpu)"
    if dev.platform == "tpu":
        from vae_hmc_tpu.metrics.internal import pairwise_sq_dists
        from vae_hmc_tpu.ops.pallas.distance_kernel import (
            pairwise_dists_pallas)
        from vae_hmc_tpu.ops.pallas.logmel_kernel import (
            logmel_standardized_pallas)
        key = jax.random.PRNGKey(0)
        # generate ON DEVICE via jit: eager jax.random.normal materializes
        # host-side on this platform and uploads through the tunnel
        # (CLAUDE.md env gotchas) — 15 MB of smoke inputs once took 25 min
        # under congestion
        xs = jax.jit(lambda k: jax.random.normal(k, (512, 2048),
                                                 jnp.float32))(key)
        d_p = pairwise_dists_pallas(xs)
        d_x = jnp.sqrt(pairwise_sq_dists(xs))
        dist_err = float(jnp.max(jnp.abs(d_p - d_x)))
        mcfg = MelConfig()
        wv = jax.jit(lambda k: 0.1 * jax.random.normal(
            k, (8, mcfg.n_samples), jnp.float32))(key)
        m_p = logmel_standardized_pallas(wv, mcfg)
        m_x = mel_ops.per_sample_standardize(mel_ops.logmel_batch(wv, mcfg))
        mel_err = float(jnp.max(jnp.abs(m_p - m_x)))
        assert dist_err < 0.5 and mel_err < 0.05, (dist_err, mel_err)
        pallas_smoke = (f"ok (compiled on {dev.device_kind}; "
                        f"dist_err={dist_err:.2e}, mel_err={mel_err:.2e})")
        print(f"[bench] pallas smoke: {pallas_smoke}", file=sys.stderr)

    mel_cfg = MelConfig()                      # 15 s, 128 mels, T=646
    # BENCH_FAST=1: documented opt-in perf mode — bf16 forward/backward with
    # f32 master params (measured 11.6 vs 13.5 ms/step at batch 64).  NON-
    # PARITY: the 25-epoch trajectory drifts (VALIDATION.md round 2), so
    # quality columns are not comparable to the f32 parity rows.  Default
    # stays f32 because quality parity with the reference's torch training
    # is the headline constraint.
    fast = os.environ.get("BENCH_FAST") == "1"
    vae_cfg = ConvMMVaeConfig(                 # 25 epochs, batch 64
        compute_dtype="bfloat16" if fast else "float32")
    mode = "fast (bf16 train, NON-parity)" if fast else "parity (f32 train)"
    ds = synthetic.make_dataset(n_tracks, seed=42, lyrics_coverage=0.9)

    # Lyrics backend (round-2 verdict: the hashed path made seconds_lyrics
    # an audio-only number wearing an end-to-end label).  Default "minilm"
    # runs the REAL Flax transformer forward over every text — with the real
    # checkpoint if VAE_HMC_MINILM_DIR is mounted, else with real-shaped
    # synthetic weights (identical program and cost; mapping is golden-
    # tested).  BENCH_LYRICS=hashed restores the cheap fallback backend.
    lyrics_backend = os.environ.get("BENCH_LYRICS", "minilm")
    minilm_state = None
    if lyrics_backend == "minilm":
        from vae_hmc_tpu.text import minilm as minilm_mod
        texts_all = [ds.lyrics[i] or "" for i in range(n_tracks)]
        mdir = os.environ.get("VAE_HMC_MINILM_DIR")
        if mdir and os.path.isdir(mdir):
            minilm_state = minilm_mod.load_minilm(mdir)
            lyrics_backend = "minilm-flax (real checkpoint)"
        else:
            minilm_state = minilm_mod.synthetic_minilm(texts_all)
            lyrics_backend = "minilm-flax (synthetic real-shaped weights)"
        # warm the compile outside the timed region (persistent-cached
        # anyway; model LOAD is setup, like the reference's model download).
        # Must use the FULL corpus: encode_texts is one scanned program
        # whose batch-count is a shape, so a 1-text warm call would compile
        # the wrong program.
        minilm_mod.encode_texts(*minilm_state, texts_all, batch_size=128,
                                to_host=False)

    # =================== timed region ===================
    # stage 1: the whole synth+log-mel stage is ONE scanned device program
    # (pipelines.features fused path, round 4): per scan step, waveforms are
    # synthesized from ~16 host floats/track and the fused log-mel kernel
    # runs in place.  Was ~46 batches x 2 dispatches — each dispatch costs
    # ~0.5-1 s under tunnel congestion, so the loop was the tier's weather
    # vane.  ALL large arrays stay HBM-resident end to end: on this
    # tunneled dev chip, device->host readback runs at ~1 MB/s, and on real
    # deployments the principle is the same — features feed training in
    # place, no host trip.
    from vae_hmc_tpu.pipelines import features as feat_pipe
    from vae_hmc_tpu.pipelines.sources import SyntheticSource

    t0 = time.perf_counter()
    # AOT train setup OVERLAPPED with stages 1-2 (round 5): the fused train
    # program's setup — jitted init dispatch, ~2 s Python trace, multi-MB
    # executable cache-load through the tunnel — needs only SHAPES, and the
    # tunnel sits idle while the device owns the scanned feature program.
    # prepare_conv_mm_vae builds the SAME program fit() would (bit-identity
    # pinned by tests/test_prepared_fit.py); stage 3 consumes it.  Inside
    # the timed region: this is pipelining, not pre-warming.
    import threading
    prep_box = {}

    def _prepare():
        try:
            prep_box["prep"] = model_api.prepare_conv_mm_vae(
                n_tracks, (mel_cfg.n_mels, mel_cfg.n_frames, 1), 384,
                vae_cfg)
        except Exception as e:                      # fall back to plain fit
            prep_box["err"] = e

    prep_thread = threading.Thread(target=_prepare, daemon=True)
    prep_thread.start()
    src = SyntheticSource(ds, seed=42, device=True)
    x_mel, _ids, _report = feat_pipe.build_logmel(
        src, mel_cfg, device_batch=128, hbm_resident=True)
    # build_logmel DROPS non-finite rows; the lyrics/has/genre arrays below
    # are built from the full track list, so a silent drop would misalign
    # every row past it (audio i+1 paired with lyrics i) and corrupt the
    # headline metric.  Synthetic waveforms are finite by construction —
    # make any violation loud rather than silently shifting rows.
    if len(_ids) != n_tracks:
        raise RuntimeError(
            f"feature build dropped {n_tracks - len(_ids)} non-finite rows; "
            "bench requires full alignment (see report: "
            f"{[r for r in _report.rows if r[2] != 'ok'][:5]})")
    x_mel = x_mel[..., None]                           # (N, 128, T, 1) NHWC
    # stage-boundary sync via a tiny scalar HOST FETCH: block_until_ready is
    # unreliable on the async tunneled platform (CLAUDE.md), which would let
    # feature time bleed into seconds_lyrics/seconds_train (advisor round 3)
    float(jnp.sum(x_mel[0, :2, 0, 0]))
    t1 = time.perf_counter()

    # stage 2: lyrics embeddings (script 11 — a sentence-transformer pass
    # over every document in the reference, 11:84-93)
    texts = [ds.lyrics[i] or "" for i in range(n_tracks)]
    has = np.asarray([1.0 if ds.lyrics[i] else 0.0
                      for i in range(n_tracks)], np.float32)
    if minilm_state is not None:
        from vae_hmc_tpu.text.minilm import encode_texts
        lyr = encode_texts(*minilm_state, texts, batch_size=128,
                           to_host=False)          # stays HBM-resident
        lyr = lyr * jnp.asarray(has)[:, None]
        float(jnp.sum(lyr[0, :2]))    # scalar-fetch sync (see t1 note)
    else:
        lyr = hashed_embedding(texts, 384) * has[:, None]
    t2 = time.perf_counter()

    # stage 3: conv multimodal VAE training (script 12); x_mel stays on device
    prep_thread.join()
    if "err" in prep_box:
        print(f"[bench] prepare_conv_mm_vae failed ({prep_box['err']}); "
              "falling back to in-line setup", file=sys.stderr)
    model, res, mu = model_api.train_conv_mm_vae(
        x_mel, lyr, has, vae_cfg, prepared=prep_box.get("prep"))
    float(jnp.sum(mu[0, :2]))         # scalar-fetch sync (see t1 note)
    t3 = time.perf_counter()

    # stage 4: KMeans + metrics (scripts 13/20 core)
    km = kmeans(mu, KMeansConfig(n_clusters=6, n_init=10, seed=42))
    genre_idx = np.asarray(
        [list(synthetic.GENRES).index(g) for g in ds.genres])
    sil = internal.silhouette(mu, km.labels)
    dbi = internal.davies_bouldin(mu, km.labels)
    ari = external.adjusted_rand_index(km.labels, genre_idx)
    t4 = time.perf_counter()
    # =================== end timed region ===================

    total = t4 - t0
    tracks_per_sec = n_tracks / total
    ref_tracks_per_sec = 5.0                   # documented estimate above
    result = {
        "metric": "tracks/sec end-to-end (mel->VAE->KMeans) on FMA-small-3k",
        "value": round(tracks_per_sec, 2),
        "unit": "tracks/sec",
        "vs_baseline": round(tracks_per_sec / ref_tracks_per_sec, 2),
        "n_tracks": n_tracks,
        "seconds_total": round(total, 2),
        "seconds_features": round(t1 - t0, 2),
        "seconds_lyrics": round(t2 - t1, 2),
        "lyrics_backend": lyrics_backend,
        "seconds_train": round(t3 - t2, 2),
        "seconds_cluster_metrics": round(t4 - t3, 2),
        "train_final_loss": round(res.history[-1]["total"], 4),
        "silhouette": round(float(sil), 5),
        "davies_bouldin": round(float(dbi), 5),
        "ari_vs_genre": round(float(ari), 5),
        "device": f"{dev.device_kind}",
        "mode": mode,
        "pallas_smoke": pallas_smoke,
    }
    # mechanical quality gate (round-5): compare the headline columns
    # against the committed QUALITY_GOLDENS.json — "bit-stable" is now a
    # checked property, not a prose claim.  A deliberate numerics change
    # must update the goldens in the same commit (tools/update_goldens.py).
    from vae_hmc_tpu.core import goldens
    qkey = goldens.golden_key("bench", n_tracks,
                              "fast" if fast else "parity")
    qres = goldens.check(qkey, goldens.extract_bench(result))
    result["quality_drift"] = (qres["status"] if not qres["mismatches"]
                               else f"drift: {'; '.join(qres['mismatches'])}")
    if qres["status"] == "drift":
        print(f"[bench] QUALITY DRIFT ({qkey}): {qres['mismatches']}",
              file=sys.stderr)
    # committed machine-readable record of every successful run: an
    # end-of-round outage can no longer void the round's perf evidence
    backend_mod.record_bench(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
