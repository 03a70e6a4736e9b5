"""AOT-prepared training (train.prepare_fit / api.prepare_conv_mm_vae).

The prepared path exists to move wall clock, not numerics: the fused
fast-path program is built from shapes alone before the data exists
(overlapped with upstream pipeline stages by bench.py / pipelines.medium),
and MUST be bit-identical to the plain fit() path — same init program, same
seeds, same train_all structure.  These tests pin that identity plus every
guard that keeps a prepared executable from silently running against the
wrong data layout or hyperparameters.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_hmc_tpu.core.config import ConvMMVaeConfig
from vae_hmc_tpu.models import api as model_api
from vae_hmc_tpu.models.dense_vae import DenseVAE
from vae_hmc_tpu.models.train import fit, prepare_fit


def _dense_setup(rng, n=130, d=12):
    # n=130, batch 40 -> 3 full batches + a 10-row remainder: the prepared
    # program must cover the drop_last=False remainder step too
    x = rng.normal(0, 1, (n, d)).astype(np.float32)
    model = DenseVAE(input_dim=d, hidden_dims=(16,), latent_dim=3)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, d)), key)

    def apply_fn(p, r, xb):
        return model.apply(p, xb, r)

    return x, params, apply_fn


def _assert_bit_identical(ra, rb):
    assert ra.history == rb.history
    for la, lb in zip(jax.tree_util.tree_leaves(ra.params),
                      jax.tree_util.tree_leaves(rb.params)):
        assert np.array_equal(np.asarray(la), np.asarray(lb))


def test_prepared_matches_plain_bitwise(rng):
    x, params, apply_fn = _dense_setup(rng)
    kw = dict(epochs=4, batch_size=40, learning_rate=1e-3, beta=1.0,
              seed=3, kl_anneal_epochs=2)
    plain = fit(apply_fn, params, (x,), **kw)
    prep = prepare_fit(apply_fn, params,
                       (jax.ShapeDtypeStruct(x.shape, x.dtype),), **kw)
    prepared = fit(apply_fn, params, (x,), prepared=prep, **kw)
    _assert_bit_identical(plain, prepared)


def test_prepared_matches_plain_chunked(rng, monkeypatch):
    """The prepared path plans row chunks from ShapeDtypeStructs; forcing a
    tiny boundary must produce the same chunk plan (fingerprint match) and
    the same bits as plain fit under the same boundary."""
    x, params, apply_fn = _dense_setup(rng)
    d = x.shape[1]
    monkeypatch.setenv("VAE_HMC_GATHER_CHUNK_BYTES", str(d * 4 * 37))
    kw = dict(epochs=3, batch_size=32, learning_rate=1e-3, seed=0)
    plain = fit(apply_fn, params, (x,), **kw)
    prep = prepare_fit(apply_fn, params,
                       (jax.ShapeDtypeStruct(x.shape, x.dtype),), **kw)
    assert len(prep.fingerprint[1][0]) > 1      # plan actually chunked
    prepared = fit(apply_fn, params, (x,), prepared=prep, **kw)
    _assert_bit_identical(plain, prepared)


def test_prepared_fingerprint_mismatch_raises(rng):
    x, params, apply_fn = _dense_setup(rng)
    kw = dict(epochs=3, batch_size=40, learning_rate=1e-3, seed=3)
    prep = prepare_fit(apply_fn, params,
                       (jax.ShapeDtypeStruct(x.shape, x.dtype),), **kw)
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        fit(apply_fn, params, (x,), prepared=prep,
            epochs=3, batch_size=40, learning_rate=2e-3, seed=3)
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        fit(apply_fn, params, (x[:100],), prepared=prep,
            epochs=3, batch_size=40, learning_rate=1e-3, seed=3)


def test_prepared_rejects_unpreparable_paths(rng, tmp_path):
    x, params, apply_fn = _dense_setup(rng)
    kw = dict(epochs=2, batch_size=40, learning_rate=1e-3, seed=3)
    prep = prepare_fit(apply_fn, params,
                       (jax.ShapeDtypeStruct(x.shape, x.dtype),), **kw)
    with pytest.raises(ValueError, match="single-device fused fast path"):
        fit(apply_fn, params, (x,), prepared=prep, verbose=True, **kw)
    with pytest.raises(ValueError, match="single-device fused fast path"):
        fit(apply_fn, params, (x,), prepared=prep,
            checkpoint_dir=str(tmp_path), **kw)


def test_prepare_conv_mm_vae_api_parity(rng):
    """Model-level handle: prepared train_conv_mm_vae == plain, bitwise,
    including the exported latents."""
    n, mels, frames, ld = 37, 8, 12, 6
    cfg = ConvMMVaeConfig(epochs=2, batch_size=16, audio_channels=(2, 4),
                          audio_fc_dim=8, latent_dim=3)
    x = rng.normal(0, 1, (n, mels, frames, 1)).astype(np.float32)
    lyr = rng.normal(0, 1, (n, ld)).astype(np.float32)
    mask = (rng.random(n) < 0.8).astype(np.float32)

    _, r0, mu0 = model_api.train_conv_mm_vae(x, lyr, mask, cfg)
    prep = model_api.prepare_conv_mm_vae(n, (mels, frames, 1), ld, cfg)
    _, r1, mu1 = model_api.train_conv_mm_vae(x, lyr, mask, cfg,
                                             prepared=prep)
    _assert_bit_identical(r0, r1)
    assert np.array_equal(np.asarray(mu0), np.asarray(mu1))


def test_prepare_dense_vae_api_parity(rng):
    from vae_hmc_tpu.core.config import DenseVaeConfig
    n, d = 53, 10
    cfg = DenseVaeConfig(input_dim=d, hidden_dims=(12,), latent_dim=3,
                         epochs=3, batch_size=16)
    x = rng.normal(0, 1, (n, d)).astype(np.float32)
    _, r0, mu0 = model_api.train_dense_vae(x, cfg)
    prep = model_api.prepare_dense_vae(n, d, cfg)
    _, r1, mu1 = model_api.train_dense_vae(x, cfg, prepared=prep)
    _assert_bit_identical(r0, r1)
    assert np.array_equal(np.asarray(mu0), np.asarray(mu1))


def test_prepare_hard_vae_api_parity(rng):
    """CVAE (cond array) and plain Beta-VAE prepared == plain, bitwise."""
    from vae_hmc_tpu.core.config import HardVaeConfig
    n, d, n_genres = 41, 14, 4
    x = rng.normal(0, 1, (n, d)).astype(np.float32)
    cond = np.eye(n_genres, dtype=np.float32)[rng.integers(0, n_genres, n)]

    cvae = HardVaeConfig(hidden_dim=12, latent_dim=3, epochs=3,
                         batch_size=16, use_cvae=True, cond_genre=True,
                         kl_anneal_epochs=2)
    _, r0, mu0 = model_api.train_hard_vae(x, cvae, cond=cond)
    prep = model_api.prepare_hard_vae(n, d, cvae, cond_dim=n_genres)
    _, r1, mu1 = model_api.train_hard_vae(x, cvae, cond=cond, prepared=prep)
    _assert_bit_identical(r0, r1)
    assert np.array_equal(np.asarray(mu0), np.asarray(mu1))

    beta = HardVaeConfig(hidden_dim=12, latent_dim=3, epochs=3,
                         batch_size=16)
    _, r0, mu0 = model_api.train_hard_vae(x, beta)
    prep = model_api.prepare_hard_vae(n, d, beta)
    _, r1, mu1 = model_api.train_hard_vae(x, beta, prepared=prep)
    _assert_bit_identical(r0, r1)
    assert np.array_equal(np.asarray(mu0), np.asarray(mu1))


def test_prepare_ae_api_parity(rng):
    from vae_hmc_tpu.core.config import AeConfig
    n, d = 47, 11
    cfg = AeConfig(input_dim=d, hidden_dim=10, latent_dim=3, epochs=3,
                   batch_size=16)
    x = rng.normal(0, 1, (n, d)).astype(np.float32)
    _, r0, z0 = model_api.train_ae(x, cfg)
    prep = model_api.prepare_ae(n, d, cfg)
    _, r1, z1 = model_api.train_ae(x, cfg, prepared=prep)
    _assert_bit_identical(r0, r1)
    assert np.array_equal(np.asarray(z0), np.asarray(z1))


def test_prepare_conv_mm_vae_guards(rng):
    n, mels, frames, ld = 20, 8, 12, 6
    cfg = ConvMMVaeConfig(epochs=1, batch_size=16, audio_channels=(2, 4),
                          audio_fc_dim=8, latent_dim=3)
    x = rng.normal(0, 1, (n, mels, frames, 1)).astype(np.float32)
    lyr = rng.normal(0, 1, (n, ld)).astype(np.float32)
    mask = np.ones(n, np.float32)
    prep = model_api.prepare_conv_mm_vae(n, (mels, frames, 1), ld, cfg)

    other = ConvMMVaeConfig(epochs=1, batch_size=16, audio_channels=(2, 4),
                            audio_fc_dim=8, latent_dim=4)
    with pytest.raises(ValueError, match="config mismatch"):
        model_api.train_conv_mm_vae(x, lyr, mask, other, prepared=prep)
    with pytest.raises(ValueError, match="shape mismatch"):
        model_api.train_conv_mm_vae(x[:10], lyr[:10], mask[:10], cfg,
                                    prepared=prep)
    from vae_hmc_tpu.parallel.mesh import make_mesh
    with pytest.raises(ValueError, match="single-device"):
        model_api.train_conv_mm_vae(x, lyr, mask, cfg, prepared=prep,
                                    mesh=make_mesh(2, shape=(2, 1)))
