"""Data-parallel feature extraction over a device mesh.

The feature layer (log-mel `ops/mel.logmel_batch`, MFCC statistics
`ops/mfcc.mfcc_stats_batch`) is embarrassingly parallel over tracks: every
output row depends only on its own waveform.  Sharding the batch dimension
over the mesh's 'data' axis therefore partitions the whole fused program
(slice framing -> rfft -> mel matmul -> dB -> stats) across devices with
ZERO collectives — XLA's SPMD partitioner splits every op on the leading
dim, and per-device HBM + compute scale down by the axis size.

This is the staging path for corpora past one chip's feature memory or
throughput (the reference runs a per-track librosa loop on host CPU,
scripts/10:55-66 / 18:73-97 — it has no parallel feature path at all;
SURVEY.md §2c).  The train/cluster layers' mesh entry points live in
parallel/train_dp; this module completes the data layer.

Padding rows (added to make the batch divisible by the data axis) are
inert by construction — per-row programs cannot leak one row into
another — and are sliced off before return.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def sharded_batch_apply(fn: Callable, mesh, y, *extra):
    """Run per-row feature program ``fn(y, *extra)`` with the batch (row)
    dimension sharded over ``mesh``'s 'data' axis.

    ``y`` and every array in ``extra`` must share the leading batch dim;
    rows are zero-padded up to the data-axis multiple (uneven
    NamedSharding arrays cannot be constructed), and the output is sliced
    back to the true row count.  ``fn`` must be row-independent (each
    output row a function of the same input row only) — true of every op
    in ops/mel and ops/mfcc.
    """
    n_data = int(mesh.shape.get("data", 1))
    y = jnp.asarray(y)
    b = int(y.shape[0])
    pad = (-b) % n_data
    sharding = NamedSharding(mesh, P("data"))

    def stage(a):
        a = jnp.asarray(a)
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        return jax.device_put(a, sharding)

    out = fn(stage(y), *(stage(e) for e in extra))
    return out[:b]


def logmel_batch_sharded(y, cfg, mesh):
    """Sharded `ops.mel.logmel_batch`: (B, n_samples) -> (B, n_mels, T)
    with rows split over 'data'."""
    from vae_hmc_tpu.ops.mel import logmel_batch

    return sharded_batch_apply(lambda a: logmel_batch(a, cfg), mesh, y)


def synth_features_fused_sharded(source, cfg, mesh, device_batch: int = 32,
                                 kind: str = "logmel"):
    """Mesh-sharded version of the fused synth->feature scan programs
    (pipelines.features): the whole corpus stage is ONE program AND each
    scan step's batch dimension shards over 'data'.

    Combines the two scaling answers for the feature layer: the fused scan
    kills per-batch dispatch latency (round-4 congestion fix), the 'data'
    sharding splits per-step HBM/compute across devices with zero
    collectives (per-row programs cannot leak rows; the partitionable
    threefry noise draw partitions without gathering).  device_batch is
    rounded up to a data-axis multiple so the sharded dim always divides.

    -> (N, n_mels, T) for kind="logmel", (N, 2*n_mfcc) for kind="mfcc",
    sliced to the true row count.
    """
    from vae_hmc_tpu.pipelines.features import (_stacked_synth_params,
                                                _synth_logmel_program,
                                                _synth_mfcc_program)

    n = len(source)
    n_data = int(mesh.shape.get("data", 1))
    b = -(-device_batch // n_data) * n_data
    params, starts = _stacked_synth_params(source, n, b)
    sharding = NamedSharding(mesh, P(None, "data"))   # (scan, batch, ...)
    params = {k: jax.device_put(v, sharding) for k, v in params.items()}
    program = (_synth_logmel_program if kind == "logmel"
               else _synth_mfcc_program)
    out = program(params, jnp.asarray(starts), source.seed,
                  source.sample_rate, cfg)
    return out[:n]


def mfcc_stats_batch_sharded(y, cfg, mesh, lengths=None):
    """Sharded `ops.mfcc.mfcc_stats_batch`: (B, n_samples) -> (B, 2*n_mfcc).

    ``lengths`` (true sample counts for the masked/variable-length hard
    preset) shards alongside the rows; padding rows get length
    ``cfg.n_samples`` so their (discarded) stats stay finite.
    """
    from vae_hmc_tpu.ops.mfcc import mfcc_stats_batch

    if lengths is None:
        return sharded_batch_apply(
            lambda a: mfcc_stats_batch(a, cfg), mesh, y)
    y = jnp.asarray(y)
    lengths = jnp.asarray(lengths)
    b = int(y.shape[0])
    pad = (-b) % int(mesh.shape.get("data", 1))
    if pad:
        # pre-pad so the generic zero-padding never creates length-0 rows
        lengths = jnp.concatenate(
            [lengths, jnp.full((pad,), cfg.n_samples, lengths.dtype)])
        y = jnp.concatenate([y, jnp.zeros((pad,) + y.shape[1:], y.dtype)])
    out = sharded_batch_apply(
        lambda a, ln: mfcc_stats_batch(a, cfg, lengths=ln), mesh, y,
        lengths)
    return out[:b]
