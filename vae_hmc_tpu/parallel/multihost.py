"""Multi-host (DCN) scale-out: distributed init, hybrid meshes, and
process-sharded feature staging.

The reference is strictly single-process/single-device (torch with
num_workers=0; SURVEY.md §2c has no distributed story).  This module is the
framework's path past one TPU host:

  - `init_distributed` brings up the JAX distributed runtime
    (jax.distributed.initialize) from explicit args or the standard
    TPU-pod/cluster environment autodetection;
  - `global_mesh` builds a ('data', 'model') mesh over ALL processes'
    devices, laid out so the 'model' (tensor-parallel) axis stays inside one
    host — its collectives ride ICI — while only the 'data' axis crosses the
    DCN, where per-step traffic is a scalar psum of loss/grads;
  - `stage_local_shard` / `global_batch_from_local` implement
    process-sharded feature staging: each host decodes/loads ONLY its own
    row range and the global jax.Array is assembled from per-process local
    shards (jax.make_array_from_process_local_data) with no host ever
    materializing the full corpus.

Everything degrades to the single-process case (the dev environment here),
where the same code paths run on a local mesh — tests exercise them on the
8-virtual-device CPU platform.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     auto: bool = False) -> int:
    """Initialize the JAX distributed runtime; returns the process count.

    No args and auto=False: no-op (single-process dev environment).
    `auto=True` defers all detection to jax.distributed's cluster
    autodetection (TPU pod metadata / cluster env) — opt-in because
    single-host plugin environments can carry pod-looking env vars
    (this dev chip exports TPU_WORKER_HOSTNAMES=localhost).
    Safe to call twice.
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return jax.process_count()
    env_hint = (coordinator_address
                or os.environ.get("JAX_COORDINATOR_ADDRESS")
                or os.environ.get("COORDINATOR_ADDRESS"))
    if not (auto or num_processes is not None or env_hint is not None):
        return jax.process_count()          # single-process dev environment
    jax.distributed.initialize(coordinator_address=env_hint,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count()


def global_mesh(model_parallel: int = 1,
                axis_names: Tuple[str, str] = ("data", "model")) -> Mesh:
    """('data', 'model') mesh over all global devices, DCN-aware.

    The device matrix is laid out so each mesh ROW (fixed 'data' index,
    varying 'model') is a set of devices on ONE process: tensor-parallel
    collectives (the psum over enc_fc partial sums, the dec_fc2 all-gather)
    never leave a host's ICI domain, and only data-parallel gradient psums
    cross the DCN — the layout the scaling model requires (gradients are a
    per-step all-reduce of ~2M params; activations would be per-layer).
    """
    devs = jax.devices()
    n = len(devs)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by "
                         f"model_parallel={model_parallel}")
    if jax.process_count() > 1:
        per_proc = [d for d in devs if d.process_index == 0]
        if model_parallel > len(per_proc):
            raise ValueError(
                f"model_parallel={model_parallel} spans hosts "
                f"({len(per_proc)} local devices): TP collectives would "
                "ride DCN — shrink it or widen the host")
        # sort by (process, local order) so rows stay intra-process
        devs = sorted(devs, key=lambda d: (d.process_index, d.id))
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def padded_rows(n_rows: int, mesh: Mesh) -> int:
    """Smallest row count >= n_rows divisible by the mesh's 'data' axis.

    A P('data') jax.Array cannot be CONSTRUCTED with an uneven leading dim
    (NamedSharding indices require exact division — verified: device_put of
    (10,3) over data=4 raises).  All explicit staging therefore pads the
    leading dim to this size with zero rows; consumers index only rows
    < n_rows (the fused trainer's gathers already work that way).
    """
    n_data = int(mesh.shape.get("data", 1))
    return -(-n_rows // n_data) * n_data


def process_row_range(n_rows: int, process_id: Optional[int] = None,
                      process_count: Optional[int] = None,
                      mesh: Optional[Mesh] = None) -> Tuple[int, int]:
    """[start, stop) VALID row range this process is responsible for staging.

    With `mesh`, the range is derived from the P('data') sharding itself —
    the union of this process's addressable device shards over the PADDED
    row count (sharding.devices_indices_map), clamped to n_rows — so the
    staged local rows always agree with what
    make_array_from_process_local_data expects, for any n_rows
    (round-2 advisor finding: divmod balancing disagrees with the
    ceil-split shards whenever n_rows isn't divisible by the data axis).

    Without a mesh it falls back to divmod balancing — fine for
    manifest-level pre-partitioning that is later re-staged, but staging
    for a specific mesh must pass that mesh.
    """
    pid = jax.process_index() if process_id is None else process_id
    if mesh is not None:
        start, stop = _padded_span(mesh, padded_rows(n_rows, mesh), pid)
        return min(start, n_rows), min(stop, n_rows)
    pc = jax.process_count() if process_count is None else process_count
    base, extra = divmod(n_rows, pc)
    start = pid * base + min(pid, extra)
    return start, start + base + (1 if pid < extra else 0)


def _padded_span(mesh: Mesh, n_pad: int, pid: int) -> Tuple[int, int]:
    """This process's contiguous [start, stop) over the PADDED row axis."""
    sharding = NamedSharding(mesh, P("data"))
    spans = sorted({
        (idx[0].start or 0, n_pad if idx[0].stop is None else idx[0].stop)
        for dev, idx in sharding.devices_indices_map((n_pad,)).items()
        if dev.process_index == pid})
    if not spans:
        return 0, 0
    for (_, a1), (b0, _) in zip(spans, spans[1:]):
        if b0 > a1:         # device layout interleaves processes -> no
            raise ValueError(   # contiguous local range exists
                "process shards are not contiguous; use global_mesh() "
                f"layout (got spans {spans} for process {pid})")
    return spans[0][0], spans[-1][1]


def global_batch_from_local(local_rows: np.ndarray, mesh: Mesh,
                            n_global_rows: int) -> jax.Array:
    """Assemble a row-sharded global array from per-process local rows.

    `local_rows` is exactly this process's `process_row_range(mesh=mesh)`
    slice of the (n_global_rows, ...) feature array.  The result is one
    global jax.Array sharded P('data') over `mesh`; no process ever holds
    the full corpus.

    When n_global_rows is not divisible by the data axis the returned
    array has `padded_rows(n_global_rows, mesh)` rows, the tail zero-filled
    (uneven P('data') arrays cannot be constructed — see padded_rows).
    Consumers must index only rows < n_global_rows; the fused trainer does
    (models.train.fit gathers by permutation of arange(n_rows)).

    Single-process: local_rows IS the full array and this reduces to a
    device_put with the 'data' sharding.
    """
    sharding = NamedSharding(mesh, P("data"))
    n_pad = padded_rows(n_global_rows, mesh)
    pid = jax.process_index()
    span = _padded_span(mesh, n_pad, pid)
    expect_valid = (min(span[0], n_global_rows), min(span[1], n_global_rows))
    if local_rows.shape[0] != expect_valid[1] - expect_valid[0]:
        raise ValueError(
            f"process {pid} staged {local_rows.shape[0]} rows but its "
            f"sharded range is {expect_valid} — stage with "
            "process_row_range(n, mesh=mesh)")
    tail = span[1] - expect_valid[1]          # zero rows this process owes
    if tail:
        pad_block = np.zeros((tail,) + local_rows.shape[1:],
                             local_rows.dtype)
        local_rows = np.concatenate([local_rows, pad_block], axis=0)
    global_shape = (n_pad,) + tuple(local_rows.shape[1:])
    if jax.process_count() == 1:
        return jax.device_put(np.ascontiguousarray(local_rows), sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_rows), global_shape)


def stage_features_sharded(source_rows_fn, n_rows: int, mesh: Mesh,
                           batch: int = 256,
                           feature_dims: Optional[Tuple[int, ...]] = None
                           ) -> jax.Array:
    """Process-sharded feature staging driver.

    `source_rows_fn(start, stop) -> np.ndarray` produces host feature rows
    [start, stop) (decode + DSP for this process's manifest slice, e.g.
    pipelines.features build on a sub-manifest).  Each process walks only
    its own range in `batch`-row chunks, then the shards are fused into one
    global P('data') array.  The range comes from the mesh's own P('data')
    sharding, so uneven n_rows stage correctly.

    `feature_dims` (the per-row trailing shape) is only needed when a
    process can end up with ZERO rows (more processes than row-shards); the
    empty local array must still carry the full rank for global assembly.
    """
    start, stop = process_row_range(n_rows, mesh=mesh)
    chunks = [source_rows_fn(s, min(s + batch, stop))
              for s in range(start, stop, batch)]
    if chunks:
        local = np.concatenate(chunks, axis=0)
    elif feature_dims is not None:
        local = np.zeros((0,) + tuple(feature_dims), np.float32)
    else:
        raise ValueError(
            f"process {jax.process_index()} stages no rows for n_rows="
            f"{n_rows}; pass feature_dims so the empty shard has the "
            "right rank")
    return global_batch_from_local(local, mesh, n_rows)
