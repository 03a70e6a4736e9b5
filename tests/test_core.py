"""Core utilities: alignment, manifest, scaler, config serialization."""
import json
from pathlib import Path

import numpy as np
import pytest

from vae_hmc_tpu.core import align, config
from vae_hmc_tpu.core.manifest import (Manifest, read_manifest,
                                       validate_balanced, write_manifest)
from vae_hmc_tpu.ops.scaler import StandardScaler


def test_align_secondary_to_primary_mask_semantics():
    prim = np.array([10, 20, 30, 40])
    sec_ids = np.array([30, 10])
    sec = np.array([[3.0, 3.0], [1.0, 1.0]])
    out, mask = align.align_secondary_to_primary(prim, sec_ids, sec)
    np.testing.assert_array_equal(mask, [1, 0, 1, 0])
    np.testing.assert_array_equal(out[0], [1.0, 1.0])
    np.testing.assert_array_equal(out[2], [3.0, 3.0])
    np.testing.assert_array_equal(out[1], [0.0, 0.0])   # zero-fill missing


def test_align_mixed_id_types():
    out, mask = align.align_secondary_to_primary(
        np.array(["10", "20"]), np.array([20, 10]),
        np.array([[2.0], [1.0]]))
    np.testing.assert_array_equal(out[:, 0], [1.0, 2.0])
    assert mask.sum() == 2


def test_encode_labels_sorted_unique():
    codes, classes = align.encode_labels(["rock", "folk", "rock", "pop"])
    assert list(classes) == ["folk", "pop", "rock"]
    np.testing.assert_array_equal(codes, [2, 0, 2, 1])


def test_manifest_roundtrip_and_path_normalization(tmp_path):
    rows = [{"track_id": "5", "genre": "Rock",
             "audio_path": "data\\fma_small\\005\\000005.mp3"}]
    p = write_manifest(tmp_path / "m.csv", rows)
    m = read_manifest(p)
    assert m.track_ids.tolist() == [5]
    assert str(m.audio_paths()[0]) == "data/fma_small/005/000005.mp3"
    assert m.genre_map() == {5: "Rock"}


def test_validate_balanced_raises():
    m = Manifest([{"track_id": "1", "genre": "a"},
                  {"track_id": "2", "genre": "a"},
                  {"track_id": "3", "genre": "b"}])
    with pytest.raises(ValueError):
        validate_balanced(m, per_genre=2, n_genres=2)


def test_scaler_matches_sklearn_and_roundtrips(tmp_path, rng):
    from sklearn.preprocessing import StandardScaler as SkScaler
    x = rng.normal(3, 5, (50, 4)).astype(np.float32)
    x[:, 2] = 7.0                                   # zero-variance column
    ours = np.asarray(StandardScaler().fit_transform(x))
    ref = SkScaler().fit_transform(x)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    s = StandardScaler().fit(x)
    s.save(tmp_path / "s.npz")
    s2 = StandardScaler.load(tmp_path / "s.npz")
    np.testing.assert_allclose(np.asarray(s2.transform(x)), ours, atol=1e-6)


def test_config_presets_cite_reference_defaults():
    assert config.MFCC_EASY.duration_s == 30.0 and config.MFCC_EASY.n_mfcc == 40
    assert config.MFCC_HARD.duration_s == 20.0
    assert config.MFCC_HARD.min_duration_s == 1.0
    assert config.MEL_MEDIUM.n_frames == 646
    assert config.DENSE_VAE_EASY.epochs == 40
    assert config.CONV_MM_VAE_MEDIUM.epochs == 25
    assert config.CONV_MM_VAE_MEDIUM.learning_rate == 2e-3
    assert config.HARD_BETA_VAE.beta == 4.0
    assert config.HARD_BETA_VAE.loss_reduction == "sum"
    assert config.KMEANS_EASY.n_clusters == 5 and config.KMEANS_EASY.standardize
    assert not config.KMEANS_HARD.standardize
    assert config.SWEEP_MEDIUM.ks == (4, 5, 6, 7, 8)


def test_config_json_roundtrip(tmp_path):
    config.to_json(config.DENSE_VAE_EASY, tmp_path / "c.json")
    d = json.loads((tmp_path / "c.json").read_text())
    assert d["latent_dim"] == 16 and d["epochs"] == 40


def test_named_keys_stable():
    from vae_hmc_tpu.core import rng as rngmod
    a = rngmod.named_keys(42, "shuffle", "noise")
    b = rngmod.named_keys(42, "noise", "shuffle")
    np.testing.assert_array_equal(np.asarray(a["noise"]),
                                  np.asarray(b["noise"]))


def test_pca_gram_trick_matches_sklearn_wide():
    """PCA on wide data (d > 2n) runs the Gram-matrix factorization; the
    components/variances must still match sklearn's SVD path."""
    from sklearn.decomposition import PCA as SkPCA

    from vae_hmc_tpu.ops.pca import PCA

    rng = np.random.default_rng(3)
    x = (rng.normal(0, 1, (40, 7)) @ rng.normal(0, 1, (7, 300))
         + 0.01 * rng.normal(0, 1, (40, 300))).astype(np.float32)
    ours, sk = PCA(5).fit(x), SkPCA(5).fit(x)
    np.testing.assert_allclose(ours.explained_variance_,
                               sk.explained_variance_, rtol=2e-3)
    np.testing.assert_allclose(ours.explained_variance_ratio_,
                               sk.explained_variance_ratio_, rtol=2e-3)
    # same subspace AND same svd_flip sign convention
    for i in range(5):
        dot = float(np.dot(ours.components_[i], sk.components_[i]))
        assert dot > 0.99, (i, dot)
    np.testing.assert_allclose(
        np.asarray(ours.transform(x)), sk.transform(x), atol=5e-2)


def test_subspace_topk_matches_numpy():
    """Block subspace iteration (the O(1)-program-size eigensolver used for
    large-N PCA / UMAP spectral init) vs numpy's dense eigh."""
    from vae_hmc_tpu.ops.subspace import topk_eigh

    rng = np.random.default_rng(7)
    b = rng.normal(0, 1, (600, 40)).astype(np.float32)
    a = (b * (np.arange(40, 0, -1) ** 1.5)) @ b.T          # decaying PSD
    w_np, v_np = np.linalg.eigh(a)
    w_np, v_np = w_np[::-1][:4], v_np[:, ::-1][:, :4]
    w, v = topk_eigh(np.asarray(a, np.float32), 4)
    np.testing.assert_allclose(np.asarray(w), w_np, rtol=1e-3)
    for i in range(4):
        assert abs(float(np.dot(np.asarray(v)[:, i], v_np[:, i]))) > 0.999


def test_subspace_deflated_matches_laplacian_eigh():
    """Deflated shifted-operator iteration == bottom nontrivial eigenvectors
    of the normalized Laplacian (the UMAP spectral-init identity)."""
    from vae_hmc_tpu.ops.subspace import topk_eigh_deflated

    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, (300, 5)).astype(np.float32)
    d2 = ((x[:, None] - x[None, :]) ** 2).sum(-1)
    W = np.exp(-d2)
    np.fill_diagonal(W, 0.0)
    deg = W.sum(1)
    inv_sqrt = 1.0 / np.sqrt(deg)
    S = inv_sqrt[:, None] * W * inv_sqrt[None, :]
    L = np.eye(300) - S
    w_np, v_np = np.linalg.eigh(L)                          # ascending
    _, v = topk_eigh_deflated(np.asarray(S + np.eye(300), np.float32),
                              np.asarray(np.sqrt(deg), np.float32), 2)
    v = np.asarray(v)
    for i in range(2):
        assert abs(float(np.dot(v[:, i], v_np[:, 1 + i]))) > 0.99, i


def test_pca_large_n_subspace_path_matches_numpy():
    """n > 512 with d > 2n routes PCA through _gram_topk (subspace
    iteration); coordinates must match the exact SVD."""
    from vae_hmc_tpu.ops.pca import PCA

    rng = np.random.default_rng(5)
    x = (rng.normal(0, 1, (600, 12)) @ rng.normal(0, 1, (12, 1300))
         + 0.05 * rng.normal(0, 1, (600, 1300))).astype(np.float32)
    xc = x - x.mean(0)
    _, s_np, vt_np = np.linalg.svd(xc, full_matrices=False)
    ours = PCA(3).fit(x)
    np.testing.assert_allclose(ours.explained_variance_,
                               s_np[:3] ** 2 / (600 - 1), rtol=2e-3)
    z, z_np = np.asarray(ours.transform(x)), xc @ vt_np[:3].T
    for i in range(3):                      # per-component up to svd_flip sign
        c = np.dot(z[:, i], z_np[:, i]) / (
            np.linalg.norm(z[:, i]) * np.linalg.norm(z_np[:, i]))
        assert abs(float(c)) > 0.999, (i, c)


def test_pca_mid_d_subspace_and_cov_paths():
    """d in (512, 2n] routes through _cov_topk; d <= 512 with d <= 2n
    through _svd_via_cov.  Both must match sklearn."""
    from sklearn.decomposition import PCA as SkPCA

    from vae_hmc_tpu.ops.pca import PCA

    rng = np.random.default_rng(9)
    for n, d in ((700, 600), (80, 50)):
        x = (rng.normal(0, 1, (n, 8)) @ rng.normal(0, 1, (8, d))
             + 0.05 * rng.normal(0, 1, (n, d))).astype(np.float32)
        ours, sk = PCA(3).fit(x), SkPCA(3).fit(x)
        np.testing.assert_allclose(ours.explained_variance_,
                                   sk.explained_variance_, rtol=2e-3)
        z, z_sk = np.asarray(ours.transform(x)), sk.transform(x)
        for i in range(3):
            c = np.dot(z[:, i], z_sk[:, i]) / (
                np.linalg.norm(z[:, i]) * np.linalg.norm(z_sk[:, i]))
            assert float(c) > 0.999, (n, d, i, c)   # sign conv must match too


def test_subspace_topk_near_degenerate_pair():
    """A near-degenerate top pair (ratio 0.999) converges as a SUBSPACE
    (Rayleigh-Ritz separates inside the block); individual vectors may
    rotate within the pair but the spanned projector must match numpy."""
    from vae_hmc_tpu.ops.subspace import topk_eigh

    rng = np.random.default_rng(13)
    q, _ = np.linalg.qr(rng.normal(0, 1, (400, 400)))
    w_true = np.concatenate([[100.0, 99.9], np.linspace(40, 0.1, 398)])
    a = (q * w_true) @ q.T
    w, v = topk_eigh(np.asarray(a, np.float32), 2)
    np.testing.assert_allclose(np.sort(np.asarray(w))[::-1],
                               [100.0, 99.9], rtol=1e-3)
    # projector distance between spans
    v = np.asarray(v)
    p_ours = v @ v.T
    v_np = q[:, :2]
    p_np = v_np @ v_np.T
    assert np.abs(p_ours - p_np).max() < 5e-3


def test_pca_oversize_k_raises_like_sklearn():
    """Oversize n_components raises by default (sklearn parity, VERDICT r3
    weak #6); allow_cap=True restores the explicit capped fit."""
    import pytest

    from vae_hmc_tpu.ops.pca import PCA

    x = np.random.default_rng(5).normal(0, 1, (10, 6)).astype(np.float32)
    with pytest.raises(ValueError, match="n_components=8"):
        PCA(8).fit(x)                  # 8 > min(10, 6)
    with pytest.raises(ValueError, match="n_components=32"):
        PCA(32).fit(x)                 # 32 > n_samples too
    p = PCA(32, allow_cap=True).fit(x)
    assert p.n_components_ == 6
    assert np.asarray(p.components_).shape == (6, 6)


def test_fetch_pytree_single_buffer_bit_exact():
    """Single-buffer device->host fetch (the 342 MB checkpoint-fetch path)
    must be bit-exact for mixed dtypes, nested trees, scalars, and host
    leaves passed through."""
    import jax
    import jax.numpy as jnp

    from vae_hmc_tpu.core.artifacts import fetch_pytree_single_buffer

    rng_ = np.random.default_rng(11)
    tree = {
        "a": jnp.asarray(rng_.normal(0, 1, (17, 5)).astype(np.float32)),
        "nested": {
            "b": jnp.asarray(rng_.normal(0, 1, (3, 4, 2)).astype(np.float32)),
            "c": jnp.asarray(np.int32([[1, 2], [3, 4]])),
            "scalar": jnp.asarray(np.float32(3.5)),
        },
        "host_leaf": np.arange(6, dtype=np.int64),
    }
    got = fetch_pytree_single_buffer(tree)
    assert jax.tree_util.tree_structure(got) == jax.tree_util.tree_structure(tree)
    for g, l in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(tree)):
        assert isinstance(g, np.ndarray)
        assert g.dtype == np.asarray(l).dtype
        np.testing.assert_array_equal(g, np.asarray(l))


def test_fetch_pytree_chunked_bit_exact():
    """chunk_mb fetch (head-of-line-fair artifact-thread path) must produce
    bit-identical results to the one-shot fetch, including when the buffer
    size is not a chunk multiple and when a dtype group is below the
    chunk threshold."""
    import jax
    import jax.numpy as jnp

    from vae_hmc_tpu.core.artifacts import fetch_pytree_single_buffer

    rng_ = np.random.default_rng(12)
    tree = {
        # 70k f32 floats = 280 KB -> several chunks at chunk_mb=0.1
        "big": jnp.asarray(rng_.normal(0, 1, (70_001,)).astype(np.float32)),
        "small_int": jnp.asarray(np.int32([7, 8, 9])),  # below threshold
    }
    one = fetch_pytree_single_buffer(tree)
    chunked = fetch_pytree_single_buffer(tree, chunk_mb=0.1)
    for a, b in zip(jax.tree_util.tree_leaves(one),
                    jax.tree_util.tree_leaves(chunked)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(a, b)
