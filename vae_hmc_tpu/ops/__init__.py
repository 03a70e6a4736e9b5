from vae_hmc_tpu.ops import mel, mfcc, pca, scaler, stft  # noqa: F401
