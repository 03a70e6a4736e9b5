from vae_hmc_tpu.metrics.external import (  # noqa: F401
    adjusted_rand_index, contingency_matrix, normalized_mutual_info, purity)
from vae_hmc_tpu.metrics.internal import (  # noqa: F401
    calinski_harabasz, davies_bouldin, pairwise_sq_dists, silhouette)
from vae_hmc_tpu.metrics.safe import (  # noqa: F401
    safe_ari, safe_calinski_harabasz, safe_davies_bouldin, safe_silhouette)
