from vae_hmc_tpu.io.audio import load_audio  # noqa: F401
