"""Torch-oracle golden tests: the Flax models ARE the reference models.

For every reference architecture (MLPVAE 06:145-179, ConvMultiModalVAE
12:83-190, hard MLPVAE/CVAE 19:64-121, AE 22:66-88) this transplants one
set of torch-initialized weights into the Flax model via
models/torch_port.py and asserts

  * forward outputs agree (<= ~1e-5 f32),
  * every reference ELBO reduction agrees (mean 06:182-188 / 12:262-264,
    per-sample-sum 19:226-228),
  * parameter gradients agree,

with a SHARED reparameterization noise injected into both frameworks
(tests/torch_ref_models.py fixtures).  Any drift in conv padding, the
decoder crop, the lyrics gate, CVAE conditioning, flatten order, or a loss
reduction fails these tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.torch_ref_models import (RefAE, RefConvMultiModalVAE,
                                    RefHardMLPVAE, RefMLPVAE,
                                    ref_vae_loss_mean, ref_vae_loss_sum)
from vae_hmc_tpu.models import torch_port
from vae_hmc_tpu.models.ae import AE
from vae_hmc_tpu.models.conv_mm_vae import ConvMMVAE
from vae_hmc_tpu.models.dense_vae import DenseVAE
from vae_hmc_tpu.models.losses import elbo_loss


def _np_sd(module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _grad_sd(module) -> dict:
    # A None grad means the parameter is unused in the forward (the reference
    # discards logvar_a, 12:174); JAX returns zeros for those.
    return {k: (np.zeros(p.shape, np.float32) if p.grad is None
                else p.grad.detach().cpu().numpy())
            for k, p in module.named_parameters()}


def _assert_tree_close(flax_grads, mapped_torch_grads, rtol, atol):
    flat_a = jax.tree_util.tree_leaves_with_path(flax_grads)
    b = mapped_torch_grads
    for path, leaf in flat_a:
        ref = b
        for p in path:
            ref = ref[p.key]
        np.testing.assert_allclose(np.asarray(leaf), ref, rtol=rtol,
                                   atol=atol, err_msg=str(path))


# --------------------------------------------------------------------------
# easy-tier MLPVAE (06)
# --------------------------------------------------------------------------

def test_mlp_vae_forward_loss_grads_match_torch():
    torch.manual_seed(0)
    rng = np.random.default_rng(1)
    in_dim, hid, lat, bsz, beta = 80, 64, 16, 32, 1.0

    ref = RefMLPVAE(in_dim, hid, lat)
    sd = _np_sd(ref)
    params = jax.tree.map(jnp.asarray, torch_port.dense_vae_params(sd))
    model = DenseVAE(input_dim=in_dim, hidden_dims=(hid, hid), latent_dim=lat)

    x = rng.standard_normal((bsz, in_dim)).astype(np.float32)
    eps = rng.standard_normal((bsz, lat)).astype(np.float32)

    xt = torch.from_numpy(x)
    xhat_t, mu_t, lv_t = ref(xt, eps=torch.from_numpy(eps))
    loss_t, rec_t, kl_t = ref_vae_loss_mean(xhat_t, xt, mu_t, lv_t, beta)
    loss_t.backward()

    def fwd(p, xj):
        mu, lv = model.apply(p, xj, method=model.encode)
        z = mu + jnp.asarray(eps) * jnp.exp(0.5 * lv)
        return model.apply(p, z, method=model.decode), mu, lv

    xhat_j, mu_j, lv_j = fwd(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xhat_j), xhat_t.detach().numpy(),
                               rtol=1e-5, atol=1e-6)

    def loss_fn(p):
        xhat, mu, lv = fwd(p, jnp.asarray(x))
        loss, aux = elbo_loss(xhat, jnp.asarray(x), mu, lv, beta,
                              reduction="mean")
        return loss, aux

    (loss_j, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    np.testing.assert_allclose(float(loss_j), loss_t.detach().item(), rtol=1e-5)
    np.testing.assert_allclose(float(aux["recon"]), rec_t.detach().item(), rtol=1e-5)
    np.testing.assert_allclose(float(aux["kl"]), kl_t.detach().item(), rtol=1e-5,
                               atol=1e-7)

    mapped = torch_port.dense_vae_params(_grad_sd(ref))
    _assert_tree_close(grads, mapped, rtol=1e-4, atol=1e-7)


# --------------------------------------------------------------------------
# medium-tier ConvMultiModalVAE (12)
# --------------------------------------------------------------------------

def test_conv_mm_vae_forward_loss_grads_match_torch():
    torch.manual_seed(2)
    rng = np.random.default_rng(3)
    # (18, 22) halves to (3, 3) through the tower and makes the decoder
    # overshoot to (24, 24) on BOTH axes, exercising the crop (ref 12:260).
    h, w, lat, lyr_dim, bsz, beta = 18, 22, 8, 24, 4, 1.0

    ref = RefConvMultiModalVAE(1, (h, w), lat, lyr_dim)
    model = ConvMMVAE(n_mels=h, n_frames=w, latent_dim=lat,
                      lyrics_dim=lyr_dim)
    assert tuple(ref.audio_enc.h_shape) == (128,) + model.enc_hw
    sd = _np_sd(ref)
    params = jax.tree.map(jnp.asarray,
                          torch_port.conv_mm_vae_params(sd, model.enc_hw))

    x = rng.standard_normal((bsz, 1, h, w)).astype(np.float32)
    lyr = rng.standard_normal((bsz, lyr_dim)).astype(np.float32)
    m = (rng.random((bsz, 1)) < 0.7).astype(np.float32)   # some lyrics missing
    eps = rng.standard_normal((bsz, lat)).astype(np.float32)

    xt = torch.from_numpy(x)
    xhat_t, mu_t, lv_t = ref(xt, torch.from_numpy(lyr), torch.from_numpy(m),
                             eps=torch.from_numpy(eps))
    xhat_t = xhat_t[:, :, :h, :w]          # training-loop crop (ref 12:260)
    loss_t, rec_t, kl_t = ref_vae_loss_mean(xhat_t, xt, mu_t, lv_t, beta)
    loss_t.backward()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    def fwd(p):
        mu, lv = model.apply(p, x_nhwc, jnp.asarray(lyr), jnp.asarray(m),
                             method=model.encode)
        z = mu + jnp.asarray(eps) * jnp.exp(0.5 * lv)
        return model.apply(p, z, method=model.decode), mu, lv

    xhat_j, mu_j, lv_j = fwd(params)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.transpose(np.asarray(xhat_j), (0, 3, 1, 2)),
        xhat_t.detach().numpy(), rtol=1e-4, atol=1e-5)

    def loss_fn(p):
        xhat, mu, lv = fwd(p)
        loss, aux = elbo_loss(xhat, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),
                              mu, lv, beta, reduction="mean")
        return loss, aux

    (loss_j, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    np.testing.assert_allclose(float(loss_j), loss_t.detach().item(), rtol=1e-5)
    np.testing.assert_allclose(float(aux["recon"]), rec_t.detach().item(), rtol=1e-5)
    np.testing.assert_allclose(float(aux["kl"]), kl_t.detach().item(), rtol=1e-5,
                               atol=1e-7)

    mapped = torch_port.conv_mm_vae_params(_grad_sd(ref), model.enc_hw)
    _assert_tree_close(grads, mapped, rtol=1e-3, atol=1e-6)


# --------------------------------------------------------------------------
# hard-tier Beta-VAE and CVAE (19)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("conditional,cond_dim", [(False, 0), (True, 9)])
def test_hard_vae_forward_loss_grads_match_torch(conditional, cond_dim):
    torch.manual_seed(4)
    rng = np.random.default_rng(5)
    in_dim, hid, lat, bsz, beta = 40, 48, 16, 16, 4.0

    ref = RefHardMLPVAE(in_dim, latent_dim=lat, hidden_dim=hid,
                        cond_dim=cond_dim, conditional=conditional)
    sd = _np_sd(ref)
    params = jax.tree.map(jnp.asarray, torch_port.dense_vae_params(sd))
    model = DenseVAE(input_dim=in_dim, hidden_dims=(hid, hid),
                     latent_dim=lat, cond_dim=cond_dim)

    x = rng.standard_normal((bsz, in_dim)).astype(np.float32)
    eps = rng.standard_normal((bsz, lat)).astype(np.float32)
    c = None
    if conditional:
        c = np.zeros((bsz, cond_dim), np.float32)
        c[np.arange(bsz), rng.integers(0, cond_dim, bsz)] = 1.0

    xt = torch.from_numpy(x)
    ct = torch.from_numpy(c) if conditional else None
    xhat_t, mu_t, lv_t = ref(xt, c=ct, eps=torch.from_numpy(eps))
    loss_t, rec_t, kl_t = ref_vae_loss_sum(xhat_t, xt, mu_t, lv_t, beta)
    loss_t.backward()

    cj = jnp.asarray(c) if conditional else None

    def fwd(p):
        mu, lv = model.apply(p, jnp.asarray(x), cj, method=model.encode)
        z = mu + jnp.asarray(eps) * jnp.exp(0.5 * lv)
        return model.apply(p, z, cj, method=model.decode), mu, lv

    xhat_j, mu_j, lv_j = fwd(params)
    np.testing.assert_allclose(np.asarray(xhat_j), xhat_t.detach().numpy(),
                               rtol=1e-5, atol=1e-6)

    def loss_fn(p):
        xhat, mu, lv = fwd(p)
        loss, aux = elbo_loss(xhat, jnp.asarray(x), mu, lv, beta,
                              reduction="sum")
        return loss, aux

    (loss_j, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    np.testing.assert_allclose(float(loss_j), loss_t.detach().item(), rtol=1e-5)
    np.testing.assert_allclose(float(aux["recon"]), rec_t.detach().item(), rtol=1e-5)
    np.testing.assert_allclose(float(aux["kl"]), kl_t.detach().item(), rtol=1e-5)

    mapped = torch_port.dense_vae_params(_grad_sd(ref))
    _assert_tree_close(grads, mapped, rtol=1e-4, atol=1e-6)


# --------------------------------------------------------------------------
# hard-tier AE baseline (22)
# --------------------------------------------------------------------------

def test_ae_forward_loss_grads_match_torch():
    torch.manual_seed(6)
    rng = np.random.default_rng(7)
    in_dim, hid, lat, bsz = 60, 32, 16, 16

    ref = RefAE(in_dim, z_dim=lat, hidden=hid)
    sd = _np_sd(ref)
    params = jax.tree.map(jnp.asarray, torch_port.ae_params(sd))
    model = AE(input_dim=in_dim, hidden_dim=hid, latent_dim=lat)

    x = rng.standard_normal((bsz, in_dim)).astype(np.float32)
    xt = torch.from_numpy(x)
    xhat_t, z_t = ref(xt)
    loss_t = torch.nn.functional.mse_loss(xhat_t, xt)    # ref 22:139-171
    loss_t.backward()

    xhat_j, z_j = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(z_j), z_t.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xhat_j), xhat_t.detach().numpy(),
                               rtol=1e-5, atol=1e-6)

    def loss_fn(p):
        xhat, _ = model.apply(p, jnp.asarray(x))
        return jnp.mean((xhat - jnp.asarray(x)) ** 2)

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), loss_t.detach().item(), rtol=1e-5)
    mapped = torch_port.ae_params(_grad_sd(ref))
    _assert_tree_close(grads, mapped, rtol=1e-4, atol=1e-7)


# --------------------------------------------------------------------------
# checkpoint container formats
# --------------------------------------------------------------------------

def test_load_torch_checkpoint_unwraps_all_reference_formats(tmp_path):
    torch.manual_seed(8)
    ref = RefMLPVAE(12, 8, 4)
    sd = ref.state_dict()

    torch.save(sd, tmp_path / "raw.pt")                       # ref 06:347
    torch.save({"model": sd, "cfg": {"epochs": 1}},           # ref 12:282-285
               tmp_path / "wrapped_model.pt")
    torch.save({"state_dict": sd, "beta": 4.0},               # ref 19:248-264
               tmp_path / "wrapped_sd.pt")

    for name in ("raw.pt", "wrapped_model.pt", "wrapped_sd.pt"):
        loaded = torch_port.load_torch_checkpoint(tmp_path / name)
        assert set(loaded) == set(sd.keys())
        np.testing.assert_array_equal(loaded["enc1.weight"],
                                      sd["enc1.weight"].numpy())
