"""Replay script-15 viz exactly as run_medium_pipeline invokes it, timed.

Rebuilds the HBM-resident mel features (the ~1 GB .npy is not written on
the dev tunnel), loads the trained latents + lyrics embeddings from a
prior run_medium_timed workspace, and calls side_by_side_and_dbscan_sweep
with the same `arrays` dict the pipeline passes.  VAE_HMC_VERBOSE=1 turns
on the per-substep marks inside the function.

Run: VAE_HMC_VERBOSE=1 python tools/profile_viz15_real.py \
         [--n 2924] [--ws /tmp/medium_ws]
"""
from __future__ import annotations

import argparse
import time
import jax

import sys
from pathlib import Path

# Run as a script from anywhere: put the repo root on sys.path (the dev
# container's site-packages .pth is not guaranteed to exist).
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vae_hmc_tpu.core.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2924)
    ap.add_argument("--ws", type=str, default="/tmp/medium_ws")
    args = ap.parse_args()

    from vae_hmc_tpu.core.config import MelConfig, Workspace
    from vae_hmc_tpu.pipelines import medium
    from vae_hmc_tpu.pipelines.medium import build_audio_features
    from vae_hmc_tpu.pipelines.sources import SyntheticSource

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    ws = Workspace(args.ws)
    src = SyntheticSource.make(args.n, seed=42, lyrics_coverage=0.9,
                               device=dev.platform == "tpu")

    t0 = time.perf_counter()
    a = build_audio_features(src, ws, MelConfig(), 64, write_features=False,
                             hbm_resident=True)
    print(f"features: {time.perf_counter() - t0:.1f}s", flush=True)

    mu = np.load(ws.data / "vae_mm_latents_mu.npy")
    mu_ids = np.load(ws.data / "vae_mm_latents_track_ids.npy")
    lyr = np.load(ws.data / "lyrics_embeddings.npy")
    lyr_ids = np.load(ws.data / "lyrics_track_ids.npy")
    arrays = {"vae_mm_latents": (mu, mu_ids),
              "baseline_mel_flat": (a["x"], a["ids"]),
              "baseline_lyrics_only": (lyr, lyr_ids)}

    t0 = time.perf_counter()
    medium.side_by_side_and_dbscan_sweep(ws, k=6, arrays=arrays)
    print(f"viz15 total: {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
