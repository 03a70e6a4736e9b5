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
