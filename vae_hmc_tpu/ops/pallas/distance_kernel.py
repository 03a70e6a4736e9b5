"""Tiled pairwise euclidean distance Pallas kernel.

D[i, j] = sqrt(max(|x_i|^2 + |x_j|^2 - 2 x_i.x_j, 0)) over (N, d) inputs,
tiled (TILE_N x TILE_N) over the output with the feature dimension streamed
through VMEM in chunks and accumulated in an f32 scratch tile.  The sqrt and
clamp fuse into the epilogue, so the distance matrix is written to HBM
exactly once — the backbone op of silhouette / DBSCAN / ward on the 82k-dim
mel-flat representation (SURVEY.md §3.4: the sweep's dominant cost).

Inputs are expected mean-centered by the caller (as metrics.internal does)
to bound f32 cancellation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _kernel(x_ref, y_ref, out_ref, acc_ref, *, n_k: int, precision):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]                                   # (TN, TK)
    y = y_ref[:]                                   # (TM, TK)
    acc_ref[:] += (
        jnp.sum(x * x, axis=1)[:, None]
        + jnp.sum(y * y, axis=1)[None, :]
        - 2.0 * jax.lax.dot_general(
            x, y, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)
    )

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = jnp.sqrt(jnp.maximum(acc_ref[:], 0.0))


@partial(jax.jit, static_argnames=("tile_n", "tile_k", "interpret",
                                   "precision"))
def pairwise_dists_pallas(x: jax.Array, tile_n: int = 256,
                          tile_k: int = 512,
                          interpret: bool = False,
                          precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """(N, d) -> (N, N) euclidean distances.

    precision=HIGHEST keeps the -2ab cross term in the 3-pass f32-accurate
    MXU mode — required for sklearn-parity metrics on high-dim inputs
    (default-precision bf16 shows ~5e-3 relative distance error at d=82k);
    pass Precision.DEFAULT only for parity-insensitive consumers."""
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    n_pad = _cdiv(n, tile_n) * tile_n
    d_pad = _cdiv(d, tile_k) * tile_k
    if (n_pad, d_pad) != (n, d):
        x = jnp.pad(x, ((0, n_pad - n), (0, d_pad - d)))
    n_i, n_k = n_pad // tile_n, d_pad // tile_k
    kernel = partial(_kernel, n_k=n_k, precision=precision)
    out = pl.pallas_call(
        kernel,
        grid=(n_i, n_i, n_k),
        in_specs=[
            pl.BlockSpec((tile_n, tile_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, tile_k), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, tile_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_n, tile_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x, x)
    return out[:n, :n]
