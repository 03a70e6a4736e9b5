"""Measure device->host fetch strategies for the conv-MM checkpoint.

Round-3 measured the deferred artifact thread (dominated by the 342 MB
param fetch — two 170 MB FC kernels) at ~60 s overlapped, inflating
cluster_and_evaluate to 45.4 s through tunnel contention.  Round 4 switched
save-time fetching to core.artifacts.fetch_pytree_single_buffer (one
contiguous device->host transfer per dtype).  This tool measures, on the
real chip:

  1. per-leaf np.asarray fetch (the old path),
  2. single-buffer fetch (the new path),
  3. single-buffer fetch throughput in MB/s,

so VALIDATION.md can carry the measured numbers.  Run: python tools/profile_fetch.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pathlib import Path

# Run as a script from anywhere: put the repo root on sys.path (the dev
# container's site-packages .pth is not guaranteed to exist).
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vae_hmc_tpu.core.artifacts import fetch_pytree_single_buffer
from vae_hmc_tpu.core.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main() -> None:
    from vae_hmc_tpu.models.conv_mm_vae import ConvMMVAE

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    model = ConvMMVAE()
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(key, jnp.zeros((1, 128, 646, 1)),
                                 jnp.zeros((1, 384)), jnp.zeros((1, 1)), key)
    leaves = jax.tree_util.tree_leaves(params)
    total_mb = sum(l.size * l.dtype.itemsize for l in leaves) / 1e6
    print(f"params: {len(leaves)} leaves, {total_mb:.1f} MB", file=sys.stderr)

    # per-leaf (old path)
    t0 = time.perf_counter()
    host_leaves = [np.asarray(l) for l in leaves]
    t_leaf = time.perf_counter() - t0

    # single-buffer (new path); run twice — first call pays the concat
    # program compile
    fetch_pytree_single_buffer(params)
    t0 = time.perf_counter()
    host_tree = fetch_pytree_single_buffer(params)
    t_buf = time.perf_counter() - t0

    for a, b in zip(host_leaves, jax.tree_util.tree_leaves(host_tree)):
        np.testing.assert_array_equal(a, b)

    print(f"per-leaf fetch:      {t_leaf:7.2f} s  "
          f"({total_mb / t_leaf:6.1f} MB/s)")
    print(f"single-buffer fetch: {t_buf:7.2f} s  "
          f"({total_mb / t_buf:6.1f} MB/s)")


if __name__ == "__main__":
    main()
