"""2-D projection dispatch: pca / umap / tsne — all first-party, on device.

The reference treats umap-learn as an optional host dependency and silently
falls back to t-SNE when it's missing (scripts 08:14-18, 14:13-25,
21:13-17).  Round 2 removed the dependency: UMAP is first-party and
on-device (viz.umap), so the fallback never triggers.  When umap-learn IS
installed, set VAE_HMC_USE_UMAP_LEARN=1 to prefer it (exact reference
behavior for artifact diffing); otherwise the first-party implementation
runs — same algorithm, equivalent structure, different RNG stream.

Optionally pre-projects high-dim inputs to 50-D with PCA before UMAP/t-SNE
(reference 14:196-199).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from vae_hmc_tpu.core.config import TsneConfig, UmapConfig
from vae_hmc_tpu.ops.pca import PCA
from vae_hmc_tpu.viz.tsne import tsne

HAVE_UMAP = True                         # first-party (viz.umap)

try:                                     # optional host package (ref 08:14-18)
    import umap as _umap_learn           # noqa: F401
    _HAVE_UMAP_LEARN = True
except Exception:
    _HAVE_UMAP_LEARN = False


def reduce_2d(x: np.ndarray, method: str = "umap",
              tsne_cfg: TsneConfig = TsneConfig(),
              umap_cfg: UmapConfig = UmapConfig(),
              pre_pca_dim: Optional[int] = None) -> Tuple[np.ndarray, str]:
    """-> (xy (N, 2), method_actually_used).

    Device inputs stay on device through PCA/UMAP/t-SNE — all three are
    device programs, so converting here would only pay a host readback
    (966 MB for the mel-flat representation on this tunnel)."""
    import jax
    if not isinstance(x, jax.Array):
        x = np.asarray(x, dtype=np.float32)
    if pre_pca_dim and x.shape[1] > pre_pca_dim:
        # clamp by N for tiny runs; oversize k raises (sklearn parity)
        x = PCA(min(pre_pca_dim, int(x.shape[0]))).fit_transform(x)
    method = method.lower()
    if method == "pca":
        return np.asarray(PCA(2).fit_transform(x)), "pca"
    if method == "umap":
        if _HAVE_UMAP_LEARN and os.environ.get("VAE_HMC_USE_UMAP_LEARN"):
            reducer = _umap_learn.UMAP(n_neighbors=umap_cfg.n_neighbors,
                                       min_dist=umap_cfg.min_dist,
                                       random_state=umap_cfg.seed)
            return np.asarray(reducer.fit_transform(np.asarray(x))), "umap"
        from vae_hmc_tpu.viz.umap import umap_2d
        return umap_2d(x, n_neighbors=umap_cfg.n_neighbors,
                       min_dist=umap_cfg.min_dist,
                       seed=umap_cfg.seed), "umap"
    if method == "tsne":
        return tsne(x, tsne_cfg), "tsne"
    raise ValueError(f"unknown projection method {method!r}")
