from vae_hmc_tpu.models.ae import AE  # noqa: F401
from vae_hmc_tpu.models.conv_mm_vae import ConvMMVAE  # noqa: F401
from vae_hmc_tpu.models.dense_vae import DenseVAE  # noqa: F401
from vae_hmc_tpu.models.losses import elbo_loss  # noqa: F401
