"""Data-parallel (+ tensor-parallel) training over a device mesh.

DP design: per epoch, the shuffled dataset is materialized as
(n_batches, batch, ...) with the *batch* dimension sharded over the mesh's
'data' axis; a lax.scan walks the batch dimension with each device holding
its shard of every minibatch.  Loss/grad reductions over the global batch
become psums over ICI — inserted by XLA from the sharding annotations, not
written by hand.  Params stay replicated except kernels the caller's
sharding tree marks for tensor parallelism (parallel.mesh).

The reference has no counterpart (single-device torch, SURVEY.md §2c);
this is the framework's scale-out path for larger-than-3k corpora.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from vae_hmc_tpu.models.losses import elbo_loss
from vae_hmc_tpu.models.train import FitResult, _beta_at


def dp_fit(
    apply_fn: Callable,
    params,
    arrays: Sequence[jnp.ndarray],
    mesh,
    param_shardings=None,
    *,
    epochs: int,
    batch_size: int,
    learning_rate: float,
    beta: float = 1.0,
    reduction: str = "mean",
    seed: int = 42,
    kl_anneal_epochs: int = 0,
    variational: bool = True,
    verbose: bool = False,
) -> FitResult:
    n = int(arrays[0].shape[0])
    n_data = mesh.shape["data"]
    if batch_size % n_data != 0:
        batch_size = max(n_data, (batch_size // n_data) * n_data)
    n_full = n // batch_size
    if n_full == 0:
        raise ValueError(f"batch_size {batch_size} > dataset {n}")

    if param_shardings is None:
        param_shardings = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), params)
    params = jax.tree_util.tree_map(jax.device_put, params, param_shardings)
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)
    # scanned batches: (n_full, B, ...) with B sharded over 'data'
    def batch_shard(a):
        spec = P(None, "data") if np.ndim(a) >= 2 else P(None)
        return NamedSharding(mesh, spec)

    repl = NamedSharding(mesh, P())

    def loss_fn(p, rng, batch, beta_now):
        out = apply_fn(p, rng, *batch)
        if variational:
            xhat, mu, logvar = out
            loss, aux = elbo_loss(xhat, batch[0], mu, logvar, beta_now,
                                  reduction)
        else:
            xhat = out[0] if isinstance(out, tuple) else out
            loss = jnp.mean((xhat - batch[0]) ** 2)
            aux = {"recon": loss, "kl": jnp.zeros(()), "total": loss}
        return loss, aux

    @partial(jax.jit, donate_argnums=(0, 1))
    def epoch_step(p, opt_state, batched, epoch_key, beta_now):
        def body(carry, inp):
            p, opt_state = carry
            i, batch = inp
            rng = jax.random.fold_in(epoch_key, i)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, rng, batch, beta_now)
            updates, opt_state = tx.update(grads, opt_state, p)
            p = optax.apply_updates(p, updates)
            return (p, opt_state), jnp.stack(
                [aux["total"], aux["recon"], aux["kl"]])
        (p, opt_state), metrics = jax.lax.scan(
            body, (p, opt_state), (jnp.arange(len(batched[0])), batched))
        return p, opt_state, metrics

    root = jax.random.PRNGKey(seed)
    history: List[dict] = []
    host_arrays = [np.asarray(a) for a in arrays]
    for epoch in range(epochs):
        ekey = jax.random.fold_in(root, epoch)
        perm = np.asarray(jax.random.permutation(
            jax.random.fold_in(ekey, 7919), n))[: n_full * batch_size]
        batched = tuple(
            jax.device_put(
                a[perm].reshape((n_full, batch_size) + a.shape[1:]),
                batch_shard(a[perm].reshape((n_full, batch_size) + a.shape[1:])))
            for a in host_arrays)
        params, opt_state, metrics = epoch_step(
            params, opt_state, batched, ekey,
            jnp.asarray(_beta_at(beta, epoch, kl_anneal_epochs), jnp.float32))
        m = np.asarray(metrics).mean(axis=0)
        row = {"epoch": epoch + 1, "total": float(m[0]),
               "recon": float(m[1]), "kl": float(m[2])}
        history.append(row)
        if verbose:
            print(f"[dp epoch {epoch + 1}/{epochs}] total {row['total']:.4f}")
    return FitResult(params=params, history=history)


def kmeans_restarts_sharded(x, n_clusters: int, n_init: int, mesh,
                            seed: int = 42):
    """KMeans with the n_init restarts sharded across every mesh device.

    The restart axis is embarrassingly parallel (the reference runs the 20
    restarts serially inside sklearn, 07:70); here keys are sharded over the
    flattened ('data','model') axes and each device runs its share of the
    vmapped restarts; only the final best-of reduction crosses devices.
    """
    from vae_hmc_tpu.cluster.kmeans import _kmeanspp_init, _lloyd

    n_dev = mesh.devices.size
    n_init = max(n_init, n_dev)
    n_init = ((n_init + n_dev - 1) // n_dev) * n_dev     # pad to multiple

    x = jnp.asarray(x, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_init)
    keys = jax.device_put(keys, NamedSharding(mesh, P(("data", "model"))))
    xr = jax.device_put(x, NamedSharding(mesh, P()))

    @partial(jax.jit, static_argnames=("k",))
    def run(xx, kk, k: int):
        tol_scaled = 1e-4 * jnp.mean(jnp.var(xx, axis=0))

        def one(key):
            c0 = _kmeanspp_init(key, xx, k)
            return _lloyd(xx, c0, 300, tol_scaled)

        labels, centers, inertias, iters = jax.vmap(one)(kk)
        best = jnp.argmin(inertias)
        return labels[best], centers[best], inertias[best]

    labels, centers, inertia = run(xr, keys, n_clusters)
    return (np.asarray(labels, np.int32), np.asarray(centers),
            float(inertia))
