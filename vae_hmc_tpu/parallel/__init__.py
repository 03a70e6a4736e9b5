from vae_hmc_tpu.parallel.mesh import (  # noqa: F401
    conv_mm_param_sharding, make_mesh, replicate)
