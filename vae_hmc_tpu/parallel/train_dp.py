"""Data-parallel (+ tensor-parallel) training over a device mesh.

`dp_fit` is the mesh entry point to the ONE fused trainer
(models.train.fit): dataset rows live sharded over the mesh's 'data' axis
(per-device HBM scales down), every minibatch is sharding-constrained over
'data' so forward/backward compute shards, and loss/grad reductions over
the global batch become psums over ICI — inserted by XLA from the sharding
annotations, not written by hand.  Params stay replicated except kernels
the caller's sharding tree marks for tensor parallelism (parallel.mesh).

Because mesh training runs the SAME program as fit() (same batch
composition incl. the remainder batch, same RNG streams, same history
arithmetic), dp_fit is step-equivalent to single-device fit —
tests/test_parallel.py asserts history equality directly.

The reference has no counterpart (single-device torch, SURVEY.md §2c);
this is the framework's scale-out path for larger-than-3k corpora.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vae_hmc_tpu.models.train import FitResult, fit


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
    compute_dtype=None,
    n_rows=None,
) -> FitResult:
    return fit(apply_fn, params, arrays,
               epochs=epochs, batch_size=batch_size,
               learning_rate=learning_rate, beta=beta, reduction=reduction,
               seed=seed, kl_anneal_epochs=kl_anneal_epochs,
               variational=variational, verbose=verbose,
               mesh=mesh, param_shardings=param_shardings,
               compute_dtype=compute_dtype, n_rows=n_rows)


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
