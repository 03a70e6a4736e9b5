"""Pallas kernels vs XLA-composed fallbacks (interpreter mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from vae_hmc_tpu.core.config import MelConfig
from vae_hmc_tpu.metrics.internal import pairwise_sq_dists
from vae_hmc_tpu.ops import mel as mel_ops


def _signals(n, dur_s, seed=0, sr=22050):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur_s)) / sr
    return np.stack([
        (np.sin(2 * np.pi * rng.uniform(100, 1000) * t)
         + 0.1 * rng.standard_normal(t.shape)).astype(np.float32)
        for _ in range(n)])


def test_fused_logmel_matches_xla_path():
    from vae_hmc_tpu.ops.pallas.logmel_kernel import logmel_standardized_pallas

    cfg = MelConfig(duration_s=1.0, n_mels=32, top_db=-1.0)
    y = _signals(3, 1.0)
    ours = np.asarray(logmel_standardized_pallas(jnp.asarray(y), cfg,
                                                 interpret=True))
    ref = mel_ops.per_sample_standardize(mel_ops.logmel_batch(
        jnp.asarray(y), cfg))
    np.testing.assert_allclose(ours, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_fused_logmel_top_db():
    from vae_hmc_tpu.ops.pallas.logmel_kernel import logmel_standardized_pallas

    cfg = MelConfig(duration_s=0.5, n_mels=32, top_db=80.0,
                    per_sample_standardize=False)
    y = _signals(2, 0.5)
    ours = np.asarray(logmel_standardized_pallas(jnp.asarray(y), cfg,
                                                 interpret=True))
    ref = np.asarray(mel_ops.logmel_batch(jnp.asarray(y), cfg))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_pairwise_dists_pallas(rng):
    from vae_hmc_tpu.ops.pallas.distance_kernel import pairwise_dists_pallas

    x = rng.normal(0, 2, (100, 40)).astype(np.float32)
    x = x - x.mean(axis=0)
    ours = np.asarray(pairwise_dists_pallas(jnp.asarray(x), tile_n=32,
                                            tile_k=32, interpret=True))
    ref = np.sqrt(np.asarray(pairwise_sq_dists(jnp.asarray(x))))
    assert ours.shape == (100, 100)
    # atol 1e-2: sqrt of f32 cancellation residue (~1e-4 in d2) near zeros
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-2)


def test_pairwise_dists_pallas_ragged_tiles(rng):
    from vae_hmc_tpu.ops.pallas.distance_kernel import pairwise_dists_pallas

    x = rng.normal(0, 1, (37, 17)).astype(np.float32)
    ours = np.asarray(pairwise_dists_pallas(jnp.asarray(x), tile_n=16,
                                            tile_k=16, interpret=True))
    ref = np.sqrt(np.asarray(pairwise_sq_dists(jnp.asarray(x))))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-2)
