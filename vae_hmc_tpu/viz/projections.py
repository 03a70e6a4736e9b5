"""2-D projection dispatch: pca / umap / tsne with the reference's
optional-dependency fallback semantics.

The reference tries `import umap` and silently falls back to t-SNE when the
package is missing (scripts 08:14-18, 14:13-25, 21:13-17).  Same here: UMAP
is a host-side optional dependency (numba-based, no TPU value at N=3k);
PCA and t-SNE are on-device.

Optionally pre-projects high-dim inputs to 50-D with PCA before UMAP/t-SNE
(reference 14:196-199).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from vae_hmc_tpu.core.config import TsneConfig, UmapConfig
from vae_hmc_tpu.ops.pca import PCA
from vae_hmc_tpu.viz.tsne import tsne

try:                                     # optional dependency (ref 08:14-18)
    import umap as _umap                 # noqa: F401
    HAVE_UMAP = True
except Exception:
    HAVE_UMAP = False


def reduce_2d(x: np.ndarray, method: str = "umap",
              tsne_cfg: TsneConfig = TsneConfig(),
              umap_cfg: UmapConfig = UmapConfig(),
              pre_pca_dim: Optional[int] = None) -> Tuple[np.ndarray, str]:
    """-> (xy (N, 2), method_actually_used)."""
    x = np.asarray(x, dtype=np.float32)
    if pre_pca_dim and x.shape[1] > pre_pca_dim:
        x = np.asarray(PCA(pre_pca_dim).fit_transform(x))
    method = method.lower()
    if method == "pca":
        return np.asarray(PCA(2).fit_transform(x)), "pca"
    if method == "umap":
        if HAVE_UMAP:
            reducer = _umap.UMAP(n_neighbors=umap_cfg.n_neighbors,
                                 min_dist=umap_cfg.min_dist,
                                 random_state=umap_cfg.seed)
            return np.asarray(reducer.fit_transform(x)), "umap"
        method = "tsne"                  # silent fallback (ref 08:84-104)
    if method == "tsne":
        return tsne(x, tsne_cfg), "tsne"
    raise ValueError(f"unknown projection method {method!r}")
