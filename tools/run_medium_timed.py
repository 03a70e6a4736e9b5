"""Timed full medium tier (scripts 10-17) at reference scale on the chip.

Measures the BASELINE.md north star: features -> conv-MM-VAE train ->
102-cell sweep -> metrics under 5 minutes on one v5e.  Uses the device
synthetic source (no audio mounted here), HBM-resident features, and the
full artifact tree except the ~1 GB mel .npy (write_features=False — the
dev tunnel reads device memory at ~1 MB/s; flip with --write-mel).

Run: python tools/run_medium_timed.py [--n 2924] [--out /tmp/medium_ws]
"""
from __future__ import annotations

import argparse
import json
import time
import jax

import sys
from pathlib import Path

# Run as a script from anywhere: put the repo root on sys.path (the dev
# container's site-packages .pth is not guaranteed to exist).
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vae_hmc_tpu.core.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2924)
    ap.add_argument("--out", type=str, default="/tmp/medium_ws")
    ap.add_argument("--write-mel", action="store_true")
    ap.add_argument("--no-viz", action="store_true")
    ap.add_argument("--no-epoch-ckpt", action="store_true",
                    help="skip the 342 MB checkpoint fetch/write: measures "
                    "the cluster/viz stages' uncontended floor (the fetch "
                    "otherwise overlaps them on the shared tunnel)")
    args = ap.parse_args()

    from vae_hmc_tpu.core.config import Workspace
    from vae_hmc_tpu.pipelines import medium
    from vae_hmc_tpu.pipelines.sources import SyntheticSource

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    # connection warmup OUTSIDE the timed region: the first device op of a
    # process pays a connection-setup stall on this tunnel (minutes under
    # congestion) that is not pipeline work
    import time as _t
    import numpy as _np

    import jax.numpy as _jnp
    _w = _t.perf_counter()
    _np.asarray(_jnp.asarray(0.0) + 1.0)
    print(f"warmup (connection setup): {_t.perf_counter() - _w:.1f}s",
          flush=True)
    src = SyntheticSource.make(args.n, seed=42, lyrics_coverage=0.9,
                               device=dev.platform == "tpu")
    ws = Workspace(args.out)

    stages = {}
    orig = {}
    t0 = time.perf_counter()

    def wrap(name, fn):
        def inner(*a, **kw):
            t = time.perf_counter()
            out = fn(*a, **kw)
            stages[name] = round(time.perf_counter() - t, 1)
            print(f"[medium] {name}: {stages[name]}s", flush=True)
            return out
        return inner

    for name in ("build_audio_features", "build_lyrics_embeddings",
                 "train_conv_mm", "cluster_and_evaluate",
                 "full_clustering_sweep", "report_tables_and_plots",
                 "visualize_clustering", "side_by_side_and_dbscan_sweep"):
        orig[name] = getattr(medium, name)
        setattr(medium, name, wrap(name, orig[name]))
    try:
        medium.run_medium_pipeline(src, ws, with_viz=not args.no_viz,
                                   device_batch=64,
                                   write_mel_features=args.write_mel,
                                   save_epoch_checkpoints=not
                                   args.no_epoch_ckpt)
    finally:
        for name, fn in orig.items():
            setattr(medium, name, fn)
    total = round(time.perf_counter() - t0, 1)
    # BASELINE.md's north star is features -> train -> sweep -> metrics;
    # the viz stages (14/15) are extra scope beyond it
    viz = ("visualize_clustering", "side_by_side_and_dbscan_sweep")
    north = round(sum(v for k, v in stages.items() if k not in viz), 1)
    print(json.dumps({"medium_tier_seconds": total,
                      "north_star_seconds": north, "n_tracks": args.n,
                      "stages": stages,
                      "north_star_under_300s": north < 300.0,
                      "under_300s": total < 300.0}))


if __name__ == "__main__":
    main()
