"""RNG discipline.

The reference seeds python/numpy/torch globally (reference scripts/06:23-28,
19:26-31, 22:29-34).  JAX is functional: we derive a key tree from one integer
seed and thread named subkeys explicitly.  Parity with torch RNG streams is
impossible by construction; reproducibility here is exact across runs of this
framework (same seed -> same artifacts), which is the property the reference's
seeding actually provides.
"""
from __future__ import annotations

import jax
import numpy as np


def root_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def named_keys(seed: int, *names: str) -> dict:
    """Derive one subkey per name, stable w.r.t. name (order-independent)."""
    base = root_key(seed)
    return {
        name: jax.random.fold_in(base, _stable_hash(name)) for name in names
    }


def _stable_hash(name: str) -> int:
    # FNV-1a 32-bit: stable across processes (python hash() is salted).
    h = 0x811C9DC5
    for b in name.encode():
        h = ((h ^ b) * 0x01000193) & 0xFFFFFFFF
    return h


def epoch_key(key: jax.Array, epoch: int) -> jax.Array:
    return jax.random.fold_in(key, epoch)
