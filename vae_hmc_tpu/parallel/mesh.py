"""Device mesh + sharding rules.

The reference has NO distributed execution of any kind (single device,
num_workers=0; SURVEY.md §2c).  This module is the first-class TPU
replacement: a 2-D mesh with axes
  - 'data'  : data parallelism over the batch (replaces the absent DDP);
  - 'model' : tensor parallelism for the one genuinely large matmul in the
              system (the conv VAE's flattened-conv -> 256 FC, a
              (~166k x 256) kernel at full mel resolution, 12:98-103) and
              embarrassing parallelism for KMeans restarts / sweep cells.

Collectives are inserted by XLA from sharding annotations (pjit model):
batch arrays sharded over 'data', the big FC kernels sharded over 'model',
everything else replicated.  No hand-written NCCL-style code — lowering to
ICI collectives is the compiler's job.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              shape: Optional[Tuple[int, int]] = None) -> Mesh:
    """2-D ('data', 'model') mesh. shape=None picks (n, 1), or (n//2, 2)
    when n is even and >= 4 so the TP axis is exercised."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        shape = (n // 2, 2) if (n % 2 == 0 and n >= 4) else (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(np.asarray(devices).reshape(shape), ("data", "model"))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh):
    """Batch axis over 'data' (and nothing over 'model')."""
    return NamedSharding(mesh, P("data"))


def conv_mm_param_sharding(mesh: Mesh, params):
    """Sharding pytree for ConvMMVAE params: TP-shard the two giant FC
    kernels along their flat-features dimension; replicate the rest.

    enc_fc kernel: (flat, fc_dim)  -> P('model', None)
    dec_fc2 kernel: (fc_dim, flat) -> P(None, 'model')
    XLA inserts the psum over 'model' for enc_fc's output and the
    all-gather for dec_fc2's input automatically.
    """
    def rule(path, leaf):
        keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if "enc_fc" in keys and keys[-1] == "kernel":
            return NamedSharding(mesh, P("model", None))
        if "dec_fc2" in keys and keys[-1] == "kernel":
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, shardings):
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
