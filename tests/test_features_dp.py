"""Mesh-sharded feature extraction (parallel/features_dp) — results must
equal the single-device programs exactly; padding rows are inert."""
import jax.numpy as jnp
import numpy as np

from vae_hmc_tpu.core.config import MelConfig, MfccConfig
from vae_hmc_tpu.parallel.features_dp import (logmel_batch_sharded,
                                              mfcc_stats_batch_sharded)
from vae_hmc_tpu.parallel.mesh import make_mesh


def _waves(rng, b, cfg):
    return rng.normal(0, 0.1, (b, cfg.n_samples)).astype(np.float32)


def test_logmel_sharded_matches_single_device():
    rng = np.random.default_rng(0)
    cfg = MelConfig(duration_s=1.5)
    y = _waves(rng, 16, cfg)              # divisible by the data axis
    from vae_hmc_tpu.ops.mel import logmel_batch

    mesh = make_mesh(8, shape=(8, 1))
    got = np.asarray(logmel_batch_sharded(y, cfg, mesh))
    ref = np.asarray(logmel_batch(jnp.asarray(y), cfg))
    np.testing.assert_array_equal(got, ref)


def test_logmel_sharded_uneven_rows():
    """Row count not divisible by the data axis: zero-padding rows are
    sliced off and real rows are untouched."""
    rng = np.random.default_rng(1)
    cfg = MelConfig(duration_s=1.5)
    y = _waves(rng, 13, cfg)              # 13 % 8 != 0
    from vae_hmc_tpu.ops.mel import logmel_batch

    mesh = make_mesh(8, shape=(8, 1))
    got = np.asarray(logmel_batch_sharded(y, cfg, mesh))
    ref = np.asarray(logmel_batch(jnp.asarray(y), cfg))
    assert got.shape == ref.shape == (13, cfg.n_mels, cfg.n_frames)
    np.testing.assert_array_equal(got, ref)


def test_mfcc_stats_sharded_masked_lengths():
    """The hard preset's variable-length masked stats shard too, with
    padding rows given full length so their discarded stats stay finite."""
    rng = np.random.default_rng(2)
    cfg = MfccConfig(duration_s=1.5, min_duration_s=0.5)
    b = 11                                 # 11 % 8 != 0
    y = _waves(rng, b, cfg)
    lengths = rng.integers(cfg.n_samples // 2, cfg.n_samples,
                           size=(b,)).astype(np.int32)
    for r in range(b):                     # zero the tail past true length
        y[r, int(lengths[r]):] = 0.0
    from vae_hmc_tpu.ops.mfcc import mfcc_stats_batch

    mesh = make_mesh(8, shape=(8, 1))
    got = np.asarray(mfcc_stats_batch_sharded(y, cfg, mesh,
                                              lengths=lengths))
    ref = np.asarray(mfcc_stats_batch(jnp.asarray(y), cfg,
                                      lengths=jnp.asarray(lengths)))
    assert got.shape == (b, 2 * cfg.n_mfcc)
    np.testing.assert_array_equal(got, ref)
    assert np.isfinite(got).all()
