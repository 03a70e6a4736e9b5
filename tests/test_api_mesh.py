"""model_api mesh routing: DP training through the high-level entry points."""
import numpy as np
import pytest

from vae_hmc_tpu.core.config import ConvMMVaeConfig, DenseVaeConfig
from vae_hmc_tpu.models import api
from vae_hmc_tpu.parallel.mesh import make_mesh


def test_dense_vae_dp_via_api(rng):
    x = rng.normal(0, 1, (128, 10)).astype(np.float32)
    cfg = DenseVaeConfig(input_dim=10, hidden_dims=(16,), latent_dim=3,
                         epochs=3, batch_size=32)
    mesh = make_mesh(8)
    model, res, mu = api.train_dense_vae(x, cfg, mesh=mesh)
    assert mu.shape == (128, 3)
    assert res.history[-1]["total"] < res.history[0]["total"]


def test_conv_mm_dp_tp_via_api(rng):
    x = rng.normal(0, 1, (32, 16, 24, 1)).astype(np.float32)
    lyr = rng.normal(0, 1, (32, 12)).astype(np.float32)
    mask = np.ones(32, np.float32)
    cfg = ConvMMVaeConfig(epochs=2, batch_size=16, latent_dim=4,
                          audio_fc_dim=32)
    mesh = make_mesh(8)     # (4 data, 2 model): DP + TP-sharded FC kernels
    model, res, mu = api.train_conv_mm_vae(x, lyr, mask, cfg, mesh=mesh)
    assert mu.shape == (32, 4)
    assert np.isfinite(res.history[-1]["total"])
