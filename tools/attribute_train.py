"""Attribute the bench's train segment + compute a FLOP-based MFU figure.

Round-2 verdict weak #4: ~14 s of the 29.65 s bench train time was
unattributed (steady state 13.5 ms/step x 1,150 steps = 15.5 s).  This tool
decomposes the EXACT bench train segment (model_api.train_conv_mm_vae at
N=2924, 25 epochs, batch 64) into:

  - init:        jitted model.init + the params/opt-state init program
  - trace+lower: python tracing + StableHLO lowering of train_all
  - compile:     XLA compile (or persistent-cache load) of train_all
  - execute:     the 1,150-step run (measured at the history fetch — the
                 only reliable sync point on this tunneled platform)
  - export:      encode_in_batches posterior-mean export

and reports per-step time, per-step FLOPs from XLA's own cost model
(compiled.cost_analysis()), and MFU against the v5e bf16 peak.

Run on the real chip:  python tools/attribute_train.py [--n 2924]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
from pathlib import Path

# Run as a script from anywhere: put the repo root on sys.path (the dev
# container's site-packages .pth is not guaranteed to exist).
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vae_hmc_tpu.core.compile_cache import enable_persistent_cache

enable_persistent_cache()

from vae_hmc_tpu.core.config import ConvMMVaeConfig  # noqa: E402

V5E_BF16_PEAK_FLOPS = 197e12      # TPU v5e peak (bf16 MXU); f32 is lower


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2924)
    args = ap.parse_args()
    cfg = ConvMMVaeConfig()
    n = args.n
    key = jax.random.PRNGKey(0)

    # Pay the axon per-process connection setup FIRST and report it on its
    # own line: the first dispatched program of a process stalls ~100-170 s
    # in the tunnel service (measured: trivial 4-elem sum 96.7-173.3 s cold,
    # 0.0 s once warm).  Without this, whatever is timed first eats it.
    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((4,))))
    t_connect = time.perf_counter() - t0

    # synthesize inputs ON DEVICE (eager jax.random.normal for big arrays
    # materializes host-side on the axon platform — CLAUDE.md)
    x = jax.jit(lambda k: jax.random.normal(
        k, (n, cfg.in_mels, cfg.in_frames, 1), jnp.float32))(key)
    lyr = jax.jit(lambda k: jax.random.normal(
        k, (n, cfg.lyrics_dim), jnp.float32))(key)
    mask = jnp.ones((n, 1), jnp.float32)
    # sync via a scalar reduction fetch — block_until_ready is unreliable here
    float(jnp.sum(mask)) + float(jnp.sum(x[0, 0, 0])) + float(jnp.sum(lyr[0, :2]))

    from vae_hmc_tpu.models.conv_mm_vae import ConvMMVAE
    from vae_hmc_tpu.models.train import encode_in_batches, fit

    model = ConvMMVAE(n_mels=cfg.in_mels, n_frames=cfg.in_frames,
                      latent_dim=cfg.latent_dim, lyrics_dim=cfg.lyrics_dim)

    t0 = time.perf_counter()
    params = jax.jit(model.init)(key, x[:1], lyr[:1], mask[:1], key)
    # force completion via ONE tiny scalar fetch (fetching the params tree
    # would pull the two ~170 MB FC kernels through the ~1 MB/s tunnel and
    # time the tunnel, not the init — measured 429 s that way)
    float(jnp.sum(params["params"]["mu"]["bias"]))
    t_init = time.perf_counter() - t0

    def apply_fn(p, rng, xb, lb, mb):
        return model.apply(p, xb, lb, mb, rng)

    import os
    os.environ["VAE_HMC_DEBUG_TIMING"] = "1"    # fit prints trace/compile/
    t0 = time.perf_counter()                     # execute/fetch lines
    res = fit(apply_fn, params, (x, lyr, mask),
              epochs=cfg.epochs, batch_size=cfg.batch_size,
              learning_rate=cfg.learning_rate, beta=cfg.beta,
              reduction=cfg.loss_reduction, seed=cfg.seed)
    t_fit = time.perf_counter() - t0

    t0 = time.perf_counter()
    def encode_mu(p, xb, lb, mb):
        return model.apply(p, xb, lb, mb, method=model.encode)[0]
    mu = encode_in_batches(encode_mu, res.params, (x, lyr, mask))
    t_export = time.perf_counter() - t0
    # second export: program is compiled/loaded, so this is pure run+fetch
    t0 = time.perf_counter()
    mu = encode_in_batches(encode_mu, res.params, (x, lyr, mask))
    t_export_warm = time.perf_counter() - t0

    # ---- FLOPs from XLA's cost model on the per-step program -------------
    steps_per_epoch = n // cfg.batch_size + (1 if n % cfg.batch_size else 0)
    total_steps = cfg.epochs * steps_per_epoch
    import optax

    from vae_hmc_tpu.models.losses import elbo_loss
    tx = optax.adam(cfg.learning_rate)
    opt_state = jax.jit(tx.init)(params)
    xb, lb, mb = x[:cfg.batch_size], lyr[:cfg.batch_size], mask[:cfg.batch_size]

    def step(p, o, xb, lb, mb, rng):
        def loss_fn(p):
            xhat, mu_, lv = apply_fn(p, rng, xb, lb, mb)
            loss, aux = elbo_loss(xhat, xb, mu_, lv, cfg.beta,
                                  cfg.loss_reduction)
            return loss, aux
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        upd, o = tx.update(grads, o, p)
        return optax.apply_updates(p, upd), o, loss

    compiled = (jax.jit(step)
                .lower(params, opt_state, xb, lb, mb, key).compile())
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    step_flops = float(ca.get("flops", float("nan")))

    out = {
        "n": n, "epochs": cfg.epochs, "batch": cfg.batch_size,
        "total_steps": total_steps,
        "seconds_connect": round(t_connect, 2),
        "seconds_init": round(t_init, 2),
        "seconds_fit_total": round(t_fit, 2),
        "seconds_export": round(t_export, 2),
        "seconds_export_warm": round(t_export_warm, 2),
        "per_step_flops": step_flops,
        "final_loss": round(res.history[-1]["total"], 4),
        "mu_shape": list(np.asarray(mu).shape),
        "note": ("fit breakdown (trace/compile/execute/fetch) printed above "
                 "by VAE_HMC_DEBUG_TIMING; per-step ms from "
                 "tools/profile_train.py K-scan differencing"),
    }
    print(json.dumps(out))
    if np.isfinite(step_flops):
        for ms in (13.5,):
            mfu = step_flops / (ms / 1e3) / V5E_BF16_PEAK_FLOPS
            print(f"[mfu] {step_flops/1e9:.1f} GFLOP/step @ {ms} ms/step "
                  f"=> {step_flops/(ms/1e3)/1e12:.1f} TFLOP/s "
                  f"= {mfu*100:.1f}% of v5e bf16 peak "
                  f"(f32 train: true peak is lower, so MFU is a floor)")


if __name__ == "__main__":
    main()
