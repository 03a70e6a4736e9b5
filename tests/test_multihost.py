"""Multi-host (DCN) staging/mesh machinery on the single-process CPU mesh.

Real DCN needs >1 process; these tests pin the parts that are
process-count-independent (row ranges, mesh layout, single-process staging
degradation) so the multi-host path is a config change, not new code.
"""
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
