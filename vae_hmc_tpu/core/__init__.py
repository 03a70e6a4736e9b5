from vae_hmc_tpu.core import align, artifacts, config, manifest, rng  # noqa: F401
