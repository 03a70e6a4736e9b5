"""On-chip Pallas vs XLA benchmark + numerics parity for the two kernels:
  - fused log-mel (mel matmul + dB + per-sample standardize)
  - tiled pairwise euclidean distances (the sweep's backbone op)

Timing: K-iteration jitted scan with a genuine carry dependence (scalar
added to the input so XLA can neither CSE nor hoist the op), differenced
across two K values to cancel dispatch/fetch overhead — the only reliable
wall-clock on this tunneled dev chip.

Run: python tools/profile_pallas.py [--n 2924] [--d 82688] [--batch 128]
"""
from __future__ import annotations

import argparse
import time
import jax
import jax.numpy as jnp
import numpy as np

import sys
from pathlib import Path

# Run as a script from anywhere: put the repo root on sys.path (the dev
# container's site-packages .pth is not guaranteed to exist).
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vae_hmc_tpu.core.compile_cache import enable_persistent_cache

enable_persistent_cache()

from vae_hmc_tpu.core.config import MelConfig
from vae_hmc_tpu.metrics.internal import pairwise_sq_dists
from vae_hmc_tpu.ops import mel as mel_ops
from vae_hmc_tpu.ops.pallas.distance_kernel import pairwise_dists_pallas
from vae_hmc_tpu.ops.pallas.logmel_kernel import logmel_standardized_pallas


def scan_time(op, x, k1=3, k2=9, reps=3):
    """op: array -> array. Returns ms/op by K-differencing."""

    def run(k):
        @jax.jit
        def prog(x0):
            def body(acc, _):
                out = op(x0 + acc.astype(x0.dtype))
                return jnp.sum(out).astype(jnp.float32) * 1e-30, ()
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                  length=k)
            return acc
        float(np.asarray(prog(x)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(prog(x)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (run(k2) - run(k1)) / (k2 - k1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2924)
    ap.add_argument("--d", type=int, default=82688)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--skip-dist", action="store_true")
    ap.add_argument("--skip-mel", action="store_true")
    args = ap.parse_args()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    key = jax.random.PRNGKey(0)

    if not args.skip_dist:
        x = jax.random.normal(key, (args.n, args.d), jnp.float32)
        x = x - jnp.mean(x, axis=0, keepdims=True)

        def xla_dist(v):
            return jnp.sqrt(pairwise_sq_dists(v))

        def pallas_dist(v):
            return pairwise_dists_pallas(v)

        diff = jax.jit(lambda v: jnp.max(jnp.abs(xla_dist(v)
                                                 - pallas_dist(v))))(x)
        scale = jax.jit(lambda v: jnp.mean(xla_dist(v)))(x)
        print(f"dist ({args.n}x{args.d}): max|pallas-xla| = "
              f"{float(diff):.3e} (mean dist {float(scale):.2f})", flush=True)
        t_x = scan_time(xla_dist, x)
        t_p = scan_time(pallas_dist, x)
        print(f"RESULT dist_xla_highest: {t_x:.1f} ms", flush=True)
        print(f"RESULT dist_pallas: {t_p:.1f} ms", flush=True)

    if not args.skip_mel:
        cfg = MelConfig()
        y = 0.1 * jax.random.normal(key, (args.batch, cfg.n_samples),
                                    jnp.float32)

        def xla_mel(w):
            return mel_ops.per_sample_standardize(
                mel_ops.logmel_batch(w, cfg))

        def pallas_mel(w):
            return logmel_standardized_pallas(w, cfg)

        diff = jax.jit(lambda w: jnp.max(jnp.abs(xla_mel(w)
                                                 - pallas_mel(w))))(y)
        print(f"logmel (B={args.batch}, 15 s): max|pallas-xla| = "
              f"{float(diff):.3e}", flush=True)
        t_x = scan_time(xla_mel, y)
        t_p = scan_time(pallas_mel, y)
        print(f"RESULT logmel_xla: {t_x:.1f} ms", flush=True)
        print(f"RESULT logmel_pallas: {t_p:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
