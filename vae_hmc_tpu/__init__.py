"""vae_hmc_tpu — TPU-native hybrid music clustering framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the
reference pipeline (NawrozHaseen/VAE-for-Hybrid-Music-Clustering): audio
feature extraction (MFCC / log-mel) as fused on-device kernels, a VAE model
family (dense VAE, conv multimodal VAE with gated fusion, Beta-VAE, CVAE,
deterministic AE baseline) in Flax, on-device clustering (KMeans /
agglomerative ward / DBSCAN / PCA) and sklearn-parity metrics (silhouette,
Davies-Bouldin, Calinski-Harabasz, ARI, NMI, purity), plus visualization
(on-device exact t-SNE) and the easy/medium/hard pipeline orchestrations that
reproduce the reference's filesystem artifact contract.

The reference is a flat collection of 23 scripts communicating through files
(see SURVEY.md); this package is a layered library + one CLI. Nothing here is
a translation: compute paths are designed for TPU (MXU matmuls, static shapes,
lax control flow, sharding over a jax Mesh) rather than ported from
torch/librosa/sklearn internals.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Platform-selection shim (round-4 finding): the environment's
# sitecustomize registers the axon TPU-tunnel plugin in EVERY process and
# pins the ambient env JAX_PLATFORMS=axon, so during a tunnel outage
# `jax.devices()` HANGS even when the caller exported JAX_PLATFORM_NAME=cpu
# (env-var selection no longer bypasses the plugin; only the config update
# does).  Translate the documented user override here — every entry point
# imports this package before touching a backend.  ONLY JAX_PLATFORM_NAME
# (the explicit user intent, per CLAUDE.md / the verify recipe) is
# translated: the ambient JAX_PLATFORMS is sitecustomize-pinned to "axon"
# in every process, so echoing it into the config would CLOBBER a prior
# explicit jax.config.update("jax_platforms", "cpu") done before this
# import (e.g. __graft_entry__.dryrun_multichip) — re-introducing the
# outage hang this shim exists to prevent.  (A user-exported JAX_PLATFORMS
# is overwritten by the sitecustomize before any Python here runs, so the
# old fallback could only ever observe the pinned "axon" anyway.)
_plat = _os.environ.get("JAX_PLATFORM_NAME")
if _plat:
    try:
        _jax.config.update("jax_platforms", _plat.lower())
    except Exception:
        pass                      # backend already initialized — too late

# Pin partitionable threefry (advisor round 3): the dynamic-k kmeans
# bit-identity proof relies on the uniform PREFIX property
# (uniform(key, (L,)) == uniform(key, (L_hi,))[:L]), which holds ONLY under
# this flag.  It is the default in jax 0.9, but a downgrade or an explicit
# flip would silently move published non-boundary-k clustering results —
# pin it at import so every entry point (CLI, bench, tests) agrees.
_jax.config.update("jax_threefry_partitionable", True)
