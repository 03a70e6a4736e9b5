"""Model family: shapes, training convergence, loss-reduction conventions."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_hmc_tpu.core.config import (AeConfig, ConvMMVaeConfig,
                                     DenseVaeConfig, HardVaeConfig)
from vae_hmc_tpu.models import api
from vae_hmc_tpu.models.conv_mm_vae import ConvMMVAE, conv_tower_shape
from vae_hmc_tpu.models.losses import elbo_loss


def test_conv_tower_shape_matches_torch_arithmetic():
    # 128x646 -> 64x323 -> 32x162 -> 16x81 (torch conv2d k3 s2 p1)
    assert conv_tower_shape(128, 646) == (16, 81)


def test_loss_reductions_differ_by_dims():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (8, 10)).astype(np.float32))
    xhat = x + 0.1
    mu = jnp.asarray(rng.normal(0, 1, (8, 4)).astype(np.float32))
    lv = jnp.zeros((8, 4))
    lm, am = elbo_loss(xhat, x, mu, lv, 1.0, "mean")
    ls, aus = elbo_loss(xhat, x, mu, lv, 1.0, "sum")
    np.testing.assert_allclose(float(aus["recon"]), float(am["recon"]) * 10, rtol=1e-5)
    np.testing.assert_allclose(float(aus["kl"]), float(am["kl"]) * 4, rtol=1e-5)


def test_dense_vae_trains_and_reduces_loss(rng):
    x = rng.normal(0, 1, (256, 20)).astype(np.float32)
    cfg = DenseVaeConfig(input_dim=20, hidden_dims=(32, 32), latent_dim=4,
                         epochs=8, batch_size=64)
    model, res, mu = api.train_dense_vae(x, cfg)
    assert mu.shape == (256, 4)
    assert res.history[-1]["total"] < res.history[0]["total"]
    assert len(res.history) == 8


def test_hard_cvae_conditioning_changes_latents(rng):
    x = rng.normal(0, 1, (200, 24)).astype(np.float32)
    cond = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 200)]
    cfg = HardVaeConfig(input_dim=24, hidden_dim=32, latent_dim=4, epochs=4,
                        batch_size=50, use_cvae=True)
    model, res, mu = api.train_hard_vae(x, cfg, cond=cond)
    assert mu.shape == (200, 4)
    assert np.isfinite(res.history[-1]["total"])


def test_conv_mm_vae_smoke(rng):
    # tiny mel images (16 mels x 20 frames) for CPU speed
    x = rng.normal(0, 1, (32, 16, 20, 1)).astype(np.float32)
    lyr = rng.normal(0, 1, (32, 12)).astype(np.float32)
    mask = (rng.random(32) < 0.8).astype(np.float32)
    cfg = ConvMMVaeConfig(epochs=2, batch_size=16, latent_dim=6,
                          audio_fc_dim=32)
    model, res, mu = api.train_conv_mm_vae(x, lyr, mask, cfg)
    assert mu.shape == (32, 6)
    assert res.history[-1]["total"] < res.history[0]["total"] * 2  # finite, sane


def test_conv_mm_mask_gates_lyrics(rng):
    """mask=0 must make lyrics input irrelevant (ref 12:177-178 semantics)."""
    x = rng.normal(0, 1, (4, 16, 20, 1)).astype(np.float32)
    lyr_a = rng.normal(0, 1, (4, 12)).astype(np.float32)
    lyr_b = rng.normal(0, 1, (4, 12)).astype(np.float32)
    model = ConvMMVAE(n_mels=16, n_frames=20, latent_dim=6, lyrics_dim=12,
                      fc_dim=32)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.asarray(x), jnp.asarray(lyr_a),
                        jnp.zeros((4, 1)), key)
    m0 = jnp.zeros((4, 1))
    mu_a1, _ = model.apply(params, jnp.asarray(x), jnp.asarray(lyr_a), m0,
                           method=model.encode)
    mu_a2, _ = model.apply(params, jnp.asarray(x), jnp.asarray(lyr_b), m0,
                           method=model.encode)
    np.testing.assert_allclose(np.asarray(mu_a1), np.asarray(mu_a2), atol=1e-6)


def test_ae_trains(rng):
    x = rng.normal(0, 1, (128, 16)).astype(np.float32)
    cfg = AeConfig(input_dim=16, hidden_dim=32, latent_dim=4, epochs=6,
                   batch_size=32)
    model, res, z = api.train_ae(x, cfg)
    assert z.shape == (128, 4)
    assert res.history[-1]["total"] < res.history[0]["total"]
