"""Micro-profiler for the conv-MM-VAE train step on the real TPU.

Times each candidate program as a K-iteration jitted lax.scan (carry-threaded
so XLA cannot CSE/hoist the body; all device operands ride the carry so they
are program ARGUMENTS, not baked-in constants) and reports
(t_K2 - t_K1) / (K2 - K1), which cancels dispatch + host-fetch overhead —
the only trustworthy timing method on this tunneled dev chip
(block_until_ready is unreliable; scalar readback is cheap).

Run: python tools/profile_train.py [--only a,b] [--skip a,b]
"""
from __future__ import annotations

import argparse
import time
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
import optax

import sys
from pathlib import Path

# Run as a script from anywhere: put the repo root on sys.path (the dev
# container's site-packages .pth is not guaranteed to exist).
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vae_hmc_tpu.core.compile_cache import enable_persistent_cache

enable_persistent_cache()

from vae_hmc_tpu.core.config import ConvMMVaeConfig
from vae_hmc_tpu.models.conv_mm_vae import ConvMMVAE
from vae_hmc_tpu.models.losses import elbo_loss


def scan_time(make_body, init_carry, k1=8, k2=40, reps=3):
    """min over reps of ((t_k2 - t_k1) / (k2 - k1)) in ms."""

    def run(k):
        @jax.jit
        def prog(c):
            def body(c, _):
                c = make_body(c)
                return c, ()
            c, _ = jax.lax.scan(body, c, None, length=k)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float32)) * 1e-30,
                c, jnp.zeros(()))
        float(np.asarray(prog(init_carry)))   # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(prog(init_carry)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = run(k1), run(k2)
    return (t2 - t1) / (k2 - k1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--skip", type=str, default="")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))
    skip = set(filter(None, args.skip.split(",")))

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)

    cfg = ConvMMVaeConfig()
    model = ConvMMVAE(n_mels=cfg.in_mels, n_frames=cfg.in_frames,
                      channels=tuple(cfg.audio_channels),
                      fc_dim=cfg.audio_fc_dim, latent_dim=cfg.latent_dim,
                      lyrics_dim=cfg.lyrics_dim)
    key = jax.random.PRNGKey(0)

    def data(B, dtype=jnp.float32):
        x = jax.random.normal(key, (B, cfg.in_mels, cfg.in_frames, 1), dtype)
        lyr = jax.random.normal(key, (B, cfg.lyrics_dim), dtype)
        m = jnp.ones((B, 1), dtype)
        return x, lyr, m

    x64, lyr64, m64 = data(64)
    params = jax.jit(model.init)(key, x64[:1], lyr64[:1], m64[:1], key)
    tx = optax.adam(cfg.learning_rate)
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(p, rng, xb, lb, mb, cast=None):
        if cast is not None:
            p = jax.tree_util.tree_map(lambda w: w.astype(cast), p)
            xb, lb, mb = xb.astype(cast), lb.astype(cast), mb.astype(cast)
        xhat, mu, logvar = model.apply(p, xb, lb, mb, rng)
        loss, _ = elbo_loss(xhat.astype(jnp.float32), xb.astype(jnp.float32),
                            mu.astype(jnp.float32),
                            logvar.astype(jnp.float32), 1.0, "mean")
        return loss

    results = {}

    def bench(name, fn, carry):
        if (only and name not in only) or name in skip:
            return
        t = scan_time(fn, carry)
        results[name] = t
        print(f"{name:44s} {t:8.3f} ms", flush=True)

    def make_step(B, cast=None):
        xb, lb, mb = data(B)

        def step(c):
            p, o, rng = c
            rng, sub = jax.random.split(rng)
            _, grads = jax.value_and_grad(loss_fn)(p, sub, xb, lb, mb, cast)
            if cast is not None:
                grads = jax.tree_util.tree_map(
                    lambda g: g.astype(jnp.float32), grads)
            upd, o = tx.update(grads, o, p)
            return optax.apply_updates(p, upd), o, rng
        return step

    bench("step_f32_b64", make_step(64), (params, opt_state, key))
    bench("step_bf16_b64", make_step(64, jnp.bfloat16),
          (params, opt_state, key))
    bench("step_f32_b256", make_step(256), (params, opt_state, key))
    bench("step_bf16_b256", make_step(256, jnp.bfloat16),
          (params, opt_state, key))
    bench("step_bf16_b512", make_step(512, jnp.bfloat16),
          (params, opt_state, key))

    # --- forward only (params ride the carry) ---
    def make_fwd(B, cast=None):
        xb, lb, mb = data(B)

        def fwd(c):
            p, acc = c
            loss = loss_fn(p, key, xb, lb, mb, cast)
            return p, acc + loss * 1e-30
        return fwd

    bench("fwd_f32_b64", make_fwd(64), (params, jnp.zeros(())))
    bench("fwd_bf16_b64", make_fwd(64, jnp.bfloat16), (params, jnp.zeros(())))

    # --- per-stage forward (f32, batch 64) ---
    def enc_tower(c):
        p, acc = c
        mu_a, _ = model.apply(p, x64, method=model.encode_audio)
        return p, acc + jnp.mean(mu_a) * 1e-30

    bench("enc_tower_f32_b64", enc_tower, (params, jnp.zeros(())))

    def make_conv(layer_name, in_shape):
        h = jax.random.normal(key, in_shape, jnp.float32)

        def conv_only(c):
            p, acc = c
            kern = p["params"][layer_name]["kernel"]
            out = jax.lax.conv_general_dilated(
                h + acc.astype(h.dtype) * 0, kern, (2, 2),
                [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return p, acc + jnp.mean(out) * 1e-30
        return conv_only

    bench("conv1_f32_b64 (1->32)",
          make_conv("enc_conv1", (64, 128, 646, 1)),
          (params, jnp.zeros(())))
    bench("conv2_f32_b64 (32->64)",
          make_conv("enc_conv2", (64, 64, 323, 32)),
          (params, jnp.zeros(())))
    bench("conv3_f32_b64 (64->128)",
          make_conv("enc_conv3", (64, 32, 162, 64)),
          (params, jnp.zeros(())))

    z64 = jax.random.normal(key, (64, cfg.latent_dim), jnp.float32)

    def dec_only(c):
        p, acc = c
        xhat = model.apply(p, z64 + acc.astype(z64.dtype) * 0,
                           method=model.decode)
        return p, acc + jnp.mean(xhat) * 1e-30

    bench("decoder_f32_b64", dec_only, (params, jnp.zeros(())))

    # --- fit-style step: per-iter random-row gather + reshape + step ---
    N = 2924
    flats = (jax.random.normal(key, (N, cfg.in_mels * cfg.in_frames),
                               jnp.float32),
             jax.random.normal(key, (N, cfg.lyrics_dim), jnp.float32),
             jnp.ones((N, 1), jnp.float32))
    perm = jax.random.permutation(key, N)[: (N // 64) * 64].reshape(-1, 64)

    def make_fit_step(cast=None, gather=True):
        def fstep(c):
            p, o, rng, i, fl, pm = c
            idx = pm[i % pm.shape[0]]
            if gather:
                xb = fl[0][idx].reshape(64, cfg.in_mels, cfg.in_frames, 1)
                lb, mb = fl[1][idx], fl[2][idx]
            else:
                xb = jax.lax.dynamic_slice_in_dim(
                    fl[0], (i % 44) * 64, 64).reshape(
                        64, cfg.in_mels, cfg.in_frames, 1)
                lb = jax.lax.dynamic_slice_in_dim(fl[1], (i % 44) * 64, 64)
                mb = jax.lax.dynamic_slice_in_dim(fl[2], (i % 44) * 64, 64)
            rng, sub = jax.random.split(rng)
            _, grads = jax.value_and_grad(loss_fn)(p, sub, xb, lb, mb, cast)
            if cast is not None:
                grads = jax.tree_util.tree_map(
                    lambda g: g.astype(jnp.float32), grads)
            upd, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, upd), o, rng, i + 1, fl, pm)
        return fstep

    fit_carry = (params, opt_state, key, jnp.zeros((), jnp.int32), flats,
                 perm)
    bench("fitstep_gather_f32_b64", make_fit_step(), fit_carry)
    bench("fitstep_slice_f32_b64", make_fit_step(gather=False), fit_carry)

    # --- gather: (B, 82688) rows from the resident (2924, .) flat ---
    N = 2924
    flat = jax.random.normal(key, (N, cfg.in_mels * cfg.in_frames),
                             jnp.float32)

    def gather_only(c):
        f, i = c
        b = f[i]
        return f, (i + jnp.sum(b[:1, :1]).astype(jnp.int32) * 0 + 1) % N

    bench("gather_b64_from_2924x82688", gather_only,
          (flat, jnp.arange(64) * 0))

    print()
    for k, v in results.items():
        print(f"RESULT {k}: {v:.3f} ms")


if __name__ == "__main__":
    main()
