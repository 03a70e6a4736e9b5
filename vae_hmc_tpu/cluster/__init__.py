from vae_hmc_tpu.cluster.kmeans import KMeansResult, kmeans, kmeans_fit_predict  # noqa: F401
