"""Weight initializers matching torch.nn.Linear / Conv2d defaults.

The reference's published loss trajectories (BASELINE.md: easy VAE 0.9995 ->
0.7381 over 40 epochs, etc.) depend on torch's default kaiming-uniform
initialization.  Flax defaults (lecun_normal) train fine but start from a
different loss scale; using the same U(-1/sqrt(fan_in), 1/sqrt(fan_in))
family keeps training curves comparable.  (Exact RNG parity is impossible —
different generators — and not required; parity is at the metric level.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """Dense kernel (in, out) or conv kernel (kh, kw, in, out): kaiming-uniform
    with a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    if len(shape) == 2:
        fan_in = shape[0]
    else:                       # flax conv kernel (kh, kw, in_ch, out_ch)
        fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
