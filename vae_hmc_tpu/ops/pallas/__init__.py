"""Pallas TPU kernels for the DSP/metrics hot path.

Each kernel has an XLA-composed fallback in the parent ops modules; the
pallas path is selected on TPU and parity-tested in interpreter mode on CPU
(tests/test_pallas.py).
"""
from vae_hmc_tpu.ops.pallas.logmel_kernel import mel_db_standardize  # noqa: F401
from vae_hmc_tpu.ops.pallas.distance_kernel import pairwise_dists_pallas  # noqa: F401
