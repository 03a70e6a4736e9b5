"""Micro-profiler for the conv-MM-VAE train step on the real TPU.

Times each candidate program as a K-iteration jitted lax.scan (carry-threaded
so XLA cannot CSE/hoist the body) and reports (t_K2 - t_K1) / (K2 - K1),
which cancels dispatch + host-fetch overhead — the only trustworthy timing
method on this tunneled dev chip (block_until_ready is unreliable; scalar
readback is cheap).

Run: python tools/profile_train.py [--batch 64] [--iters 30]
"""
from __future__ import annotations

import argparse
import os
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vae_hmc_jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from vae_hmc_tpu.core.config import ConvMMVaeConfig
from vae_hmc_tpu.models.conv_mm_vae import ConvMMVAE
from vae_hmc_tpu.models.losses import elbo_loss


def scan_time(make_body, init_carry, k1=8, k2=40, reps=3):
    """Median of reps of ((t_k2 - t_k1) / (k2 - k1)) in ms."""

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
        # compile + warm
        float(np.asarray(prog(init_carry)))
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--skip", type=str, default="",
                    help="comma list of bench names to skip")
    args = ap.parse_args()
    B = args.batch
    skip = set(filter(None, args.skip.split(",")))

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}) batch={B}")

    cfg = ConvMMVaeConfig()
    model = ConvMMVAE(n_mels=cfg.in_mels, n_frames=cfg.in_frames,
                      channels=tuple(cfg.audio_channels),
                      fc_dim=cfg.audio_fc_dim, latent_dim=cfg.latent_dim,
                      lyrics_dim=cfg.lyrics_dim)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, cfg.in_mels, cfg.in_frames, 1), jnp.float32)
    lyr = jax.random.normal(key, (B, cfg.lyrics_dim), jnp.float32)
    m = jnp.ones((B, 1), jnp.float32)
    params = jax.jit(model.init)(key, x[:1], lyr[:1], m[:1], key)
    tx = optax.adam(cfg.learning_rate)
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(p, rng, cast=None):
        if cast is not None:
            p = jax.tree_util.tree_map(lambda w: w.astype(cast), p)
            xb, lb, mb = x.astype(cast), lyr.astype(cast), m.astype(cast)
        else:
            xb, lb, mb = x, lyr, m
        xhat, mu, logvar = model.apply(p, xb, lb, mb, rng)
        loss, _ = elbo_loss(xhat.astype(jnp.float32), xb.astype(jnp.float32),
                            mu.astype(jnp.float32),
                            logvar.astype(jnp.float32), 1.0, "mean")
        return loss

    results = {}

    def bench(name, fn, carry):
        if name in skip:
            return
        t = scan_time(fn, carry)
        results[name] = t
        print(f"{name:42s} {t:8.3f} ms")

    # --- full train step, f32 (current production) ---
    def step_f32(c):
        p, o, rng = c
        rng, sub = jax.random.split(rng)
        loss, grads = jax.value_and_grad(loss_fn)(p, sub)
        upd, o = tx.update(grads, o, p)
        return optax.apply_updates(p, upd), o, rng

    bench("train_step f32", step_f32, (params, opt_state, key))

    # --- full train step, bf16 activations / f32 master params ---
    def step_bf16(c):
        p, o, rng = c
        rng, sub = jax.random.split(rng)
        loss, grads = jax.value_and_grad(
            partial(loss_fn, cast=jnp.bfloat16))(p, sub)
        grads = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32), grads)
        upd, o = tx.update(grads, o, p)
        return optax.apply_updates(p, upd), o, rng

    bench("train_step bf16-act", step_bf16, (params, opt_state, key))

    # --- forward only ---
    def fwd(c, cast=None):
        xhat, mu, logvar = model.apply(
            params if cast is None else jax.tree_util.tree_map(
                lambda w: w.astype(cast), params),
            c if cast is None else c.astype(cast), lyr if cast is None
            else lyr.astype(cast), m if cast is None else m.astype(cast),
            key)
        return c + jnp.mean(xhat).astype(c.dtype) * 1e-30

    bench("forward f32", fwd, x)
    bench("forward bf16", partial(fwd, cast=jnp.bfloat16), x)

    # --- per-stage forward (f32): carry-threaded on their own inputs ---
    c1 = model.bind(params)

    def enc_tower(c):
        mu_a, _ = c1.encode_audio(c)
        return c + jnp.mean(mu_a) * 1e-30

    bench("encoder tower (3 convs + fc)", enc_tower, x)

    h1_shape = (B, (cfg.in_mels + 1) // 2, (cfg.in_frames + 1) // 2,
                cfg.audio_channels[0])
    h1 = jax.random.normal(key, h1_shape, jnp.float32)

    def conv1_only(c):
        p1 = params["params"]["enc_conv1"]
        out = jax.lax.conv_general_dilated(
            c, p1["kernel"], (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return c + jnp.mean(out) * 1e-30

    bench("enc_conv1 only (1->32ch)", conv1_only, x)

    def conv2_only(c):
        p2 = params["params"]["enc_conv2"]
        out = jax.lax.conv_general_dilated(
            c, p2["kernel"], (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return c + jnp.mean(out) * 1e-30

    bench("enc_conv2 only (32->64ch)", conv2_only, h1)

    z = jax.random.normal(key, (B, cfg.latent_dim), jnp.float32)

    def dec_only(c):
        xhat = c1.decode(c)
        return c + jnp.mean(xhat) * 1e-30

    bench("decoder (fc + 3 deconvs)", dec_only, z)

    # --- gather cost: batch gather out of the full (N, 82688) flat ---
    N = 2924
    flat = jax.random.normal(key, (N, cfg.in_mels * cfg.in_frames),
                             jnp.float32)
    idx0 = jnp.arange(B)

    def gather_only(c):
        i = (c + idx0) % N
        b = flat[i]
        return c + (jnp.sum(b[0, :1]) * 1e-30).astype(jnp.int32)

    bench("batch gather (B,82688) from (2924,.)", gather_only,
          jnp.zeros((B,), jnp.int32) * 0)

    print()
    for k, v in results.items():
        print(f"RESULT {k}: {v:.3f} ms")


if __name__ == "__main__":
    main()
