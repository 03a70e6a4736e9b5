"""Multi-host (DCN) staging/mesh machinery on the single-process CPU mesh.

Real DCN needs >1 process; these tests pin the parts that are
process-count-independent (row ranges, mesh layout, single-process staging
degradation) so the multi-host path is a config change, not new code.
"""
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_hmc_tpu.parallel import multihost as mh


def test_init_distributed_single_process_noop():
    assert mh.init_distributed() == 1
    assert jax.process_count() == 1


def test_process_row_range_partition():
    # balanced to within 1, covers [0, n) exactly, in order
    for n, pc in [(10, 3), (2924, 4), (7, 8), (0, 2)]:
        spans = [mh.process_row_range(n, pid, pc) for pid in range(pc)]
        assert spans[0][0] == 0 and spans[-1][1] == n
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 == b0
        sizes = [b - a for a, b in spans]
        assert max(sizes) - min(sizes) <= 1


def test_process_row_range_mesh_derived_single_process():
    # sharding-derived: single process owns every shard, even uneven ones
    mesh = mh.global_mesh(model_parallel=2)
    for n in (10, 100, 2924):
        assert mh.process_row_range(n, mesh=mesh) == (0, n)


def test_stage_features_sharded_uneven_rows():
    """n_rows not divisible by the data axis: an uneven P('data') array
    cannot be constructed (round-2 advisor finding), so staging pads the
    row axis to the next data-axis multiple with zero rows."""
    mesh = mh.global_mesh(model_parallel=2)      # data axis = 4, 10 % 4 != 0
    assert mh.padded_rows(10, mesh) == 12
    full = np.random.default_rng(2).normal(size=(10, 3)).astype(np.float32)
    g = mh.stage_features_sharded(lambda s, e: full[s:e], 10, mesh, batch=4)
    assert g.shape == (12, 3)
    np.testing.assert_array_equal(np.asarray(g)[:10], full)
    np.testing.assert_array_equal(np.asarray(g)[10:], 0.0)
    sizes = sorted(s.data.shape[0] for s in g.addressable_shards)
    assert sizes == [3] * 8      # even 12/4 split, replicated over 'model'


def test_stage_features_sharded_empty_range_needs_feature_dims():
    mesh = mh.global_mesh(model_parallel=1)
    full = np.zeros((4, 3), np.float32)
    # 4 rows over 8 data shards: fine single-process (one process owns all),
    # exercise the explicit empty-fallback path instead
    got = mh.stage_features_sharded(lambda s, e: full[s:e], 4, mesh,
                                    feature_dims=(3,))
    assert got.shape == (8, 3)      # padded to the 8-way data axis


def test_global_mesh_layout():
    mesh = mh.global_mesh(model_parallel=2)
    assert mesh.axis_names == ("data", "model")
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        mh.global_mesh(model_parallel=3)     # 8 % 3 != 0


def test_global_batch_from_local_single_process():
    mesh = mh.global_mesh(model_parallel=1)
    x = np.arange(32 * 5, dtype=np.float32).reshape(32, 5)
    g = mh.global_batch_from_local(x, mesh, 32)
    assert g.shape == (32, 5)
    # sharded over 'data': 8 single-device shards of 4 rows each
    assert len(g.addressable_shards) == 8
    assert g.addressable_shards[0].data.shape == (4, 5)
    np.testing.assert_array_equal(np.asarray(g), x)
    with pytest.raises(ValueError):
        mh.global_batch_from_local(x[:16], mesh, 32)


def test_stage_features_sharded_chunks():
    mesh = mh.global_mesh(model_parallel=2)
    full = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    calls = []

    def rows(s, e):
        calls.append((s, e))
        return full[s:e]

    g = mh.stage_features_sharded(rows, 100, mesh, batch=32)
    np.testing.assert_array_equal(np.asarray(g), full)
    assert calls == [(0, 32), (32, 64), (64, 96), (96, 100)]


def test_staged_array_feeds_sharded_compute():
    """The P('data') staged array runs a jitted global reduction."""
    mesh = mh.global_mesh(model_parallel=1)
    x = np.random.default_rng(1).normal(size=(64, 7)).astype(np.float32)
    g = mh.global_batch_from_local(x, mesh, 64)
    got = jax.jit(lambda a: jnp.mean(a * a))(g)
    np.testing.assert_allclose(float(got), float(np.mean(x * x)), rtol=1e-6)


_MH_PROC_SCRIPT = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORM_NAME"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
from vae_hmc_tpu.parallel.multihost import (init_distributed, global_mesh,
                                            global_batch_from_local,
                                            process_row_range)
import jax.numpy as jnp, numpy as np
n = init_distributed(f"localhost:{port}", num_processes=nproc, process_id=pid)
assert n == nproc, n
mesh = global_mesh(model_parallel=2)
assert mesh.devices.size == 8, mesh.devices.shape
for N in (16, 10):   # divisible AND uneven (10 over data=4: 3,3,3,1 shards)
    lo, hi = process_row_range(N, mesh=mesh)
    full = np.arange(N, dtype=np.float32)[:, None] * np.ones((1, 4), np.float32)
    ga = global_batch_from_local(full[lo:hi], mesh, N)
    total = float(jax.jit(jnp.sum)(ga))
    assert total == float(full.sum()), (N, total, full.sum())
print(f"OK {pid}")
"""


def test_two_process_distributed_mesh_and_staging(tmp_path):
    """REAL multi-process jax.distributed: 2 CPU processes x 4 virtual
    devices form one 8-device ('data' 4, 'model' 2) global mesh, each
    stages only its own row block, and a jitted global reduction sees the
    full corpus.  This is the DCN story actually executed across process
    boundaries, not simulated in one process."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:               # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "mh_proc.py"
    script.write_text(_MH_PROC_SCRIPT)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    # the subprocesses must import vae_hmc_tpu regardless of whether the
    # dev host's site-packages .pth survived an environment rebuild
    repo_root = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = repo_root + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    procs = [subprocess.Popen(
        [_sys.executable, str(script), str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, (rc, out, err[-2000:])
        assert "OK" in out, (out, err[-2000:])


def test_fit_rejects_staged_padded_arrays_without_n_rows():
    """Advisor round 3: staged P('data') arrays carry zero-row padding;
    fit() must refuse to infer the row count from shape[0]."""
    from vae_hmc_tpu.models.train import fit

    mesh = mh.global_mesh(model_parallel=2)            # data axis = 4
    full = np.random.default_rng(3).normal(size=(10, 5)).astype(np.float32)
    staged = mh.stage_features_sharded(lambda s, e: full[s:e], 10, mesh)
    assert staged.shape[0] == 12                       # padded

    def apply_fn(p, rng, xb):
        h = xb @ p["w"]
        return h, jnp.zeros((xb.shape[0], 2)), jnp.zeros((xb.shape[0], 2))

    params = {"w": jnp.eye(5, dtype=jnp.float32)}
    with pytest.raises(ValueError, match="n_rows"):
        fit(apply_fn, params, (staged,), epochs=1, batch_size=4,
            learning_rate=1e-3, mesh=mesh)
    # explicit n_rows: trains only the 10 valid rows
    res = fit(apply_fn, params, (staged,), epochs=1, batch_size=4,
              learning_rate=1e-3, mesh=mesh, n_rows=10)
    assert np.isfinite(res.history[-1]["total"])


def test_threefry_partitionable_pinned_on_import():
    """The dynamic-k kmeans bit-identity proof needs the threefry prefix
    property, which only holds under jax_threefry_partitionable=True —
    pinned at package import (advisor round 3)."""
    import vae_hmc_tpu  # noqa: F401

    assert jax.config.jax_threefry_partitionable
