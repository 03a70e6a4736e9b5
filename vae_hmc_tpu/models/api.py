"""High-level train/export entry points used by the pipelines.

Each function reproduces one reference training experiment end-to-end
(model init -> fused training -> posterior-mean latent export) and returns
(params, history, latents_mu).

Pass `mesh=` (a jax Mesh from parallel.make_mesh) to train data-parallel
across devices instead of single-device: batches shard over the mesh 'data'
axis with XLA-inserted gradient reductions (parallel.train_dp.dp_fit); the
conv model additionally tensor-shards its giant FC kernels over 'model'.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vae_hmc_tpu.core.config import (AeConfig, ConvMMVaeConfig,
                                     DenseVaeConfig, HardVaeConfig)
from vae_hmc_tpu.models.ae import AE
from vae_hmc_tpu.models.conv_mm_vae import ConvMMVAE
from vae_hmc_tpu.models.dense_vae import DenseVAE
from vae_hmc_tpu.models.train import encode_in_batches, fit, prepare_fit


@dataclass(frozen=True)
class PreparedTrain:
    """Model-level AOT-prepared trainer handle (see train.prepare_fit).

    Built from SHAPES + the config alone — before the feature arrays
    exist — so a pipeline can overlap all of training setup (jitted model
    init, the fused-program Python trace, XLA compile or persistent-cache
    executable load) with upstream stages, then hand the arrays to
    train_*(..., prepared=...) the moment they land.  SINGLE USE: the
    underlying executable donates its param buffers on execution.

    cfg/shapes are recorded so the consuming train_* call can verify it is
    executing the program it thinks it is (the fused executable bakes in
    the model architecture, which train.fit's own fingerprint cannot see).
    """
    cfg: Any
    shapes: Tuple[Tuple[int, ...], ...]
    fit_prepared: Any                     # train.PreparedFit


def _check_prepared(prepared: PreparedTrain, cfg, shapes, mesh):
    if mesh is not None:
        raise ValueError("prepared training covers the single-device fused "
                         "path only (mesh given)")
    if prepared.cfg != cfg:
        raise ValueError(
            "PreparedTrain config mismatch — the AOT executable was built "
            f"for a different model/hyperparameter set:\n  prepared: "
            f"{prepared.cfg}\n  this call: {cfg}")
    if tuple(prepared.shapes) != tuple(shapes):
        raise ValueError(
            f"PreparedTrain shape mismatch: prepared {prepared.shapes} vs "
            f"arrays {tuple(shapes)}")


def _fit_dispatch(apply_fn, params, arrays, mesh, param_shardings=None,
                  **kw):
    """Route to the single-device fused trainer or the mesh DP trainer."""
    if mesh is None:
        return fit(apply_fn, params, arrays, **kw)
    from vae_hmc_tpu.parallel.train_dp import dp_fit
    kw.pop("prepared", None)    # single-device-only concept; callers raise
    return dp_fit(apply_fn, params, arrays, mesh,   # on a non-None prepared
                  param_shardings=param_shardings, **kw)


def _dense_model_and_apply(cfg: DenseVaeConfig, d: int):
    model = DenseVAE(input_dim=d, hidden_dims=tuple(cfg.hidden_dims),
                     latent_dim=cfg.latent_dim)

    def apply_fn(p, rng, xb):
        return model.apply(p, xb, rng)

    return model, apply_fn


def prepare_dense_vae(n: int, d: int, cfg: DenseVaeConfig) -> PreparedTrain:
    """AOT-build train_dense_vae's setup from shapes alone (see
    prepare_conv_mm_vae): the easy tier overlaps it with the fused
    synth->MFCC feature scan (pipelines.easy.train_basic_vae).  d is the
    standardized feature width (2*n_mfcc).  Single use."""
    model, apply_fn = _dense_model_and_apply(cfg, d)
    key = jax.random.PRNGKey(cfg.seed)
    params = jax.jit(lambda k: model.init(k, jnp.zeros((1, d)), k))(key)
    fp = prepare_fit(apply_fn, params,
                     (jax.ShapeDtypeStruct((n, d), jnp.float32),),
                     epochs=cfg.epochs, batch_size=cfg.batch_size,
                     learning_rate=cfg.learning_rate, beta=cfg.beta,
                     reduction=cfg.loss_reduction, seed=cfg.seed)
    return PreparedTrain(cfg=cfg, shapes=((n, d),), fit_prepared=fp)


def train_dense_vae(x: np.ndarray, cfg: DenseVaeConfig,
                    verbose: bool = False, mesh=None,
                    prepared: Optional[PreparedTrain] = None):
    """Easy-tier basic VAE (reference scripts/06): x is the standardized
    (N, 80) MFCC-stats matrix.  `prepared` (from prepare_dense_vae) runs
    the same program AOT-compiled earlier — bit-identical results."""
    d = x.shape[1]
    model, apply_fn = _dense_model_and_apply(cfg, d)
    if prepared is not None:
        _check_prepared(prepared, cfg, (tuple(x.shape),), mesh)
        params = prepared.fit_prepared.params
    else:
        key = jax.random.PRNGKey(cfg.seed)
        # dummy inputs built INSIDE the jit: each eager jnp.zeros is its own
        # device dispatch (~0.5-1 s under tunnel congestion)
        params = jax.jit(lambda k: model.init(k, jnp.zeros((1, d)), k))(key)

    res = _fit_dispatch(apply_fn, params, (jnp.asarray(x, jnp.float32),),
                        mesh,
                        epochs=cfg.epochs, batch_size=cfg.batch_size,
                        learning_rate=cfg.learning_rate, beta=cfg.beta,
                        reduction=cfg.loss_reduction, seed=cfg.seed,
                        verbose=verbose,
                        prepared=(None if prepared is None
                                  else prepared.fit_prepared))

    def encode_mu(p, xb):
        return model.apply(p, xb, method=model.encode)[0]

    mu = encode_in_batches(encode_mu, res.params, (jnp.asarray(x, jnp.float32),))
    return model, res, mu


def _hard_model_and_apply(cfg: HardVaeConfig, d: int, cond_dim: int):
    model = DenseVAE(input_dim=d,
                     hidden_dims=(cfg.hidden_dim, cfg.hidden_dim),
                     latent_dim=cfg.latent_dim, cond_dim=cond_dim)
    if cond_dim:

        def apply_fn(p, rng, xb, cb):
            return model.apply(p, xb, rng, cb)

        def encode_mu(p, xb, cb):
            return model.apply(p, xb, cb, method=model.encode)[0]
    else:

        def apply_fn(p, rng, xb):
            return model.apply(p, xb, rng)

        def encode_mu(p, xb):
            return model.apply(p, xb, method=model.encode)[0]

    return model, apply_fn, encode_mu


def _hard_init(model, cfg: HardVaeConfig, d: int, cond_dim: int):
    key = jax.random.PRNGKey(cfg.seed)
    if cond_dim:
        return jax.jit(lambda k: model.init(
            k, jnp.zeros((1, d)), k, jnp.zeros((1, cond_dim))))(key)
    return jax.jit(lambda k: model.init(k, jnp.zeros((1, d)), k))(key)


def prepare_hard_vae(n: int, d: int, cfg: HardVaeConfig,
                     cond_dim: int = 0) -> PreparedTrain:
    """AOT-build train_hard_vae's setup from shapes alone (see
    prepare_conv_mm_vae): the hard tier overlaps it with the script-18
    feature prep (pipelines.hard.run_hard_pipeline).  d is the early-fused
    width (2*n_mfcc + embed_dim + optional one-hots); cond_dim the CVAE
    conditioning width (0 for the plain Beta-VAE).  Single use."""
    cond_dim = 0 if not cfg.use_cvae else int(cond_dim)
    model, apply_fn, _ = _hard_model_and_apply(cfg, d, cond_dim)
    params = _hard_init(model, cfg, d, cond_dim)
    shapes = ((n, d),) + (((n, cond_dim),) if cond_dim else ())
    specs = tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes)
    fp = prepare_fit(apply_fn, params, specs,
                     epochs=cfg.epochs, batch_size=cfg.batch_size,
                     learning_rate=cfg.learning_rate, beta=cfg.beta,
                     reduction=cfg.loss_reduction, seed=cfg.seed,
                     kl_anneal_epochs=cfg.kl_anneal_epochs)
    return PreparedTrain(cfg=cfg, shapes=shapes, fit_prepared=fp)


def train_hard_vae(x: np.ndarray, cfg: HardVaeConfig,
                   cond: Optional[np.ndarray] = None,
                   verbose: bool = False, mesh=None,
                   prepared: Optional[PreparedTrain] = None):
    """Hard-tier Beta-VAE / CVAE (reference scripts/19): x is the early-fused
    (N, D) feature matrix (optionally with one-hots already appended,
    19:174-177); `cond` is the CVAE conditioning one-hot (19:180-189).
    `prepared` (from prepare_hard_vae) runs the same program AOT-compiled
    earlier — bit-identical results."""
    cond_dim = 0 if (cond is None or not cfg.use_cvae) else cond.shape[1]
    model, apply_fn, encode_mu = _hard_model_and_apply(cfg, x.shape[1],
                                                       cond_dim)
    arrays = [jnp.asarray(x, jnp.float32)]
    if cond_dim:
        arrays.append(jnp.asarray(cond, jnp.float32))
    if prepared is not None:
        _check_prepared(prepared, cfg, tuple(a.shape for a in arrays), mesh)
        params = prepared.fit_prepared.params
    else:
        params = _hard_init(model, cfg, x.shape[1], cond_dim)

    res = _fit_dispatch(apply_fn, params, arrays, mesh,
                        epochs=cfg.epochs, batch_size=cfg.batch_size,
                        learning_rate=cfg.learning_rate, beta=cfg.beta,
                        reduction=cfg.loss_reduction, seed=cfg.seed,
                        kl_anneal_epochs=cfg.kl_anneal_epochs,
                        verbose=verbose,
                        prepared=(None if prepared is None
                                  else prepared.fit_prepared))
    mu = encode_in_batches(encode_mu, res.params, arrays)
    return model, res, mu


def _conv_mm_model_and_apply(cfg: ConvMMVaeConfig, n_mels: int,
                             n_frames: int, lyrics_dim: int):
    model = ConvMMVAE(n_mels=n_mels, n_frames=n_frames,
                      channels=tuple(cfg.audio_channels),
                      fc_dim=cfg.audio_fc_dim,
                      latent_dim=cfg.latent_dim, lyrics_dim=lyrics_dim)

    def apply_fn(p, rng, xb, lb, mb):
        return model.apply(p, xb, lb, mb, rng)

    return model, apply_fn


def _conv_mm_init(model, cfg, xs, ls):
    key = jax.random.PRNGKey(cfg.seed)
    return jax.jit(lambda k: model.init(
        k, jnp.zeros((1,) + tuple(xs)), jnp.zeros((1, ls)),
        jnp.zeros((1, 1)), k))(key)


def prepare_conv_mm_vae(n: int, mel_shape: Tuple[int, ...], lyrics_dim: int,
                        cfg: ConvMMVaeConfig) -> PreparedTrain:
    """AOT-build train_conv_mm_vae's whole setup from shapes alone.

    Runs the jitted model/optimizer init dispatch, the ~2 s Python trace of
    the fused scan-over-epochs program, and the XLA compile (or persistent-
    cache executable load, multi-MB through the tunnel) NOW, so pipelines
    kick it off on a thread while feature extraction owns the device
    (bench.py stage 1-2, pipelines.medium train stage).  mel_shape is the
    per-track (n_mels, T, 1) image shape.  Consume via
    train_conv_mm_vae(..., prepared=...); single use.
    """
    xs = tuple(int(d) for d in mel_shape)
    model, apply_fn = _conv_mm_model_and_apply(cfg, xs[0], xs[1], lyrics_dim)
    params = _conv_mm_init(model, cfg, xs, lyrics_dim)
    shapes = ((n,) + xs, (n, lyrics_dim), (n, 1))
    specs = tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes)
    fp = prepare_fit(apply_fn, params, specs,
                     epochs=cfg.epochs, batch_size=cfg.batch_size,
                     learning_rate=cfg.learning_rate, beta=cfg.beta,
                     reduction=cfg.loss_reduction, seed=cfg.seed,
                     compute_dtype=cfg.compute_dtype)
    return PreparedTrain(cfg=cfg, shapes=shapes, fit_prepared=fp)


def train_conv_mm_vae(x_nhwc: np.ndarray, lyr: np.ndarray, mask: np.ndarray,
                      cfg: ConvMMVaeConfig, verbose: bool = False,
                      mesh=None, prepared: Optional[PreparedTrain] = None):
    """Medium-tier conv multimodal VAE (reference scripts/12).

    x_nhwc: (N, n_mels, T, 1) standardized log-mel; lyr: (N, 384) aligned
    lyrics embeddings (zeros when missing); mask: (N, 1) presence gate.
    `prepared` (from prepare_conv_mm_vae) runs the SAME training program,
    AOT-compiled earlier — bit-identical results, less wall clock here.
    """
    import os as _os
    import time as _time
    _dbg = _os.environ.get("VAE_HMC_DEBUG_TIMING")
    _t = _time.perf_counter()

    xs, ls = x_nhwc.shape[1:], lyr.shape[1]
    model, apply_fn = _conv_mm_model_and_apply(
        cfg, x_nhwc.shape[1], x_nhwc.shape[2], ls)

    arrays = (jnp.asarray(x_nhwc, jnp.float32), jnp.asarray(lyr, jnp.float32),
              jnp.asarray(mask, jnp.float32).reshape(-1, 1))
    if prepared is not None:
        _check_prepared(prepared, cfg, tuple(a.shape for a in arrays), mesh)
        # prepared carries its own init'd param/opt buffers; fit() uses
        # those, so skip this process's init dispatch entirely
        params = prepared.fit_prepared.params
    else:
        params = _conv_mm_init(model, cfg, xs, ls)
    shardings = None
    if mesh is not None:
        from vae_hmc_tpu.parallel.mesh import conv_mm_param_sharding
        shardings = conv_mm_param_sharding(mesh, params)
    if _dbg:
        print(f"[conv_mm] init {_time.perf_counter() - _t:.1f}s", flush=True)
        _t = _time.perf_counter()
    res = _fit_dispatch(apply_fn, params, arrays, mesh,
                        param_shardings=shardings,
                        epochs=cfg.epochs, batch_size=cfg.batch_size,
                        learning_rate=cfg.learning_rate, beta=cfg.beta,
                        reduction=cfg.loss_reduction, seed=cfg.seed,
                        verbose=verbose, compute_dtype=cfg.compute_dtype,
                        prepared=(None if prepared is None
                                  else prepared.fit_prepared))
    if _dbg:
        print(f"[conv_mm] fit {_time.perf_counter() - _t:.1f}s", flush=True)
        _t = _time.perf_counter()

    def encode_mu(p, xb, lb, mb):
        return model.apply(p, xb, lb, mb, method=model.encode)[0]

    mu = encode_in_batches(encode_mu, res.params, arrays, batch_size=256)
    if _dbg:
        print(f"[conv_mm] encode {_time.perf_counter() - _t:.1f}s",
              flush=True)
    return model, res, mu


def _ae_model_and_apply(cfg: AeConfig, d: int):
    model = AE(input_dim=d, hidden_dim=cfg.hidden_dim,
               latent_dim=cfg.latent_dim)

    def apply_fn(p, rng, xb):
        xhat, z = model.apply(p, xb)
        return (xhat,)

    return model, apply_fn


def _ae_init(model, cfg: AeConfig, d: int):
    key = jax.random.PRNGKey(cfg.seed)
    return jax.jit(lambda k: model.init(k, jnp.zeros((1, d))))(key)


def prepare_ae(n: int, d: int, cfg: AeConfig) -> PreparedTrain:
    """AOT-build train_ae's setup from shapes alone (see
    prepare_conv_mm_vae): the hard tier kicks this off the moment script
    18's feature shapes are known and consumes it in the script-22 baseline
    stage, overlapping AE setup with the whole train/cluster/viz span.
    Single use."""
    model, apply_fn = _ae_model_and_apply(cfg, d)
    params = _ae_init(model, cfg, d)
    fp = prepare_fit(apply_fn, params,
                     (jax.ShapeDtypeStruct((n, d), jnp.float32),),
                     epochs=cfg.epochs, batch_size=cfg.batch_size,
                     learning_rate=cfg.learning_rate, seed=cfg.seed,
                     variational=False)
    return PreparedTrain(cfg=cfg, shapes=((n, d),), fit_prepared=fp)


def train_ae(x: np.ndarray, cfg: AeConfig, verbose: bool = False,
             prepared: Optional[PreparedTrain] = None):
    """Deterministic AE baseline (reference scripts/22:139-171).  `prepared`
    (from prepare_ae) runs the same program AOT-compiled earlier —
    bit-identical results."""
    d = x.shape[1]
    model, apply_fn = _ae_model_and_apply(cfg, d)
    if prepared is not None:
        _check_prepared(prepared, cfg, (tuple(x.shape),), mesh=None)
        params = prepared.fit_prepared.params
    else:
        params = _ae_init(model, cfg, d)

    res = fit(apply_fn, params, (jnp.asarray(x, jnp.float32),),
              epochs=cfg.epochs, batch_size=cfg.batch_size,
              learning_rate=cfg.learning_rate, seed=cfg.seed,
              variational=False, verbose=verbose,
              prepared=(None if prepared is None
                        else prepared.fit_prepared))

    def encode_z(p, xb):
        return model.apply(p, xb, method=model.encode)

    z = encode_in_batches(encode_z, res.params, (jnp.asarray(x, jnp.float32),))
    return model, res, z
