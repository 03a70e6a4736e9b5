"""Quick chip/tunnel health probe — distinguishes tunnel weather from code
problems before trusting any wall-clock measurement.

Checks (each with a hard timeout budget, all timings host-fetch-bounded
since block_until_ready is unreliable on this platform):
  1. scalar dispatch + readback round-trip;
  2. a 1k x 1k matmul program (compile-cached after first ever run);
  3. a small logmel batch through the production kernel.

Prints one JSON line; exit 0 = healthy (all under thresholds), 1 = degraded.
Run: python tools/healthcheck.py [--budget 60]
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

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=60.0,
                    help="healthy threshold per check, seconds")
    args = ap.parse_args()
    dev = jax.devices()[0]
    out = {"device": dev.device_kind, "platform": dev.platform}

    t0 = time.perf_counter()
    _ = np.asarray(jnp.asarray(1.0) + 1.0)
    out["scalar_roundtrip_s"] = round(time.perf_counter() - t0, 2)

    x = jnp.ones((1024, 1024), jnp.float32)
    t0 = time.perf_counter()
    _ = float(jnp.sum(jnp.matmul(x, x)))
    out["matmul_1k_s"] = round(time.perf_counter() - t0, 2)

    from vae_hmc_tpu.core.config import MelConfig
    from vae_hmc_tpu.ops import mel as mel_ops
    cfg = MelConfig(duration_s=1.0)
    wav = jnp.zeros((4, int(cfg.sample_rate * cfg.duration_s)), jnp.float32)
    t0 = time.perf_counter()
    m = mel_ops.logmel_batch(wav, cfg)
    _ = float(jnp.sum(m))
    out["logmel_4x1s_s"] = round(time.perf_counter() - t0, 2)

    out["healthy"] = all(out[k] < args.budget for k in
                         ("scalar_roundtrip_s", "matmul_1k_s",
                          "logmel_4x1s_s"))
    print(json.dumps(out))
    raise SystemExit(0 if out["healthy"] else 1)


if __name__ == "__main__":
    main()
