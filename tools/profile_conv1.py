"""Ablation: how much does the 1-in-channel first conv cost, and does a
space-to-depth reformulation win?

Measures (fetch-bounded, per-op repetition):
  - the full production train step (reference point);
  - conv1 as-is: 3x3 stride-2 on (B, 128, 646, 1);
  - conv1 space-to-depth: the SAME linear map as 2x2 stride-1 on
    (B, 64, 323, 4) — contraction dim 16 vs 9, no unit channel dim.

Run: python tools/profile_conv1.py [--batch 64]
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

import jax.numpy as jnp
import numpy as np


def t_op(f, *a, reps=30):
    o = f(*a)
    _ = np.asarray(o).ravel()[0]                 # warm + sync
    t0 = time.perf_counter()
    for _i in range(reps):
        o = f(*a)
    _ = np.asarray(o).ravel()[0]                 # fetch-bounded
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    B = args.batch
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(k, (B, 128, 646, 1),
                                            jnp.float32))(key)
    jax.block_until_ready(x)

    @jax.jit
    def s2d(v):
        b, h, w, c = v.shape
        v = v.reshape(b, h // 2, 2, w // 2, 2, c)
        return v.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2,
                                                     4 * c)

    x_s2d = s2d(x)
    k1 = jax.random.normal(key, (3, 3, 1, 32), jnp.float32) * 0.05
    k1s = jax.random.normal(key, (2, 2, 4, 32), jnp.float32) * 0.05
    k2 = jax.random.normal(key, (3, 3, 32, 64), jnp.float32) * 0.05

    def _conv_base(v, k):
        return jax.lax.conv_general_dilated(
            v, k, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # timed programs reduce to one scalar INSIDE jit: fetching the full
    # (64, 64, 323, 32) output would time the tunnel, not the conv
    conv_base = jax.jit(lambda v, k: jnp.sum(_conv_base(v, k)))

    def _conv_s2d(v, k):
        # output (B, 64, 323, 32): pad 1 on the leading side of each dim so
        # block row i sees blocks {i-1, i} = original rows {2i-1..2i+1}
        return jax.lax.conv_general_dilated(
            v, k, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    conv_s2d = jax.jit(lambda v, k: jnp.sum(_conv_s2d(v, k)))
    conv_s2d_fused = jax.jit(lambda v, k: jnp.sum(_conv_s2d(s2d(v), k)))

    y1 = _conv_base(x, k1)
    jax.block_until_ready(y1)
    print(f"conv1 base (3x3 s2, 1ch in)   : {t_op(conv_base, x, k1):7.3f} ms",
          flush=True)
    print(f"conv1 s2d  (2x2 s1, 4ch in)   : "
          f"{t_op(conv_s2d, x_s2d, k1s):7.3f} ms", flush=True)
    print(f"conv1 s2d incl. relayout      : "
          f"{t_op(conv_s2d_fused, x, k1s):7.3f} ms", flush=True)
    print(f"conv2 ref  (3x3 s2, 32ch in)  : {t_op(conv_base, y1, k2):7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
