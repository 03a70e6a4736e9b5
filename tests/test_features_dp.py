"""Mesh-sharded feature extraction (parallel/features_dp) — results must
equal the single-device programs exactly; padding rows are inert."""
import jax.numpy as jnp
import numpy as np

from vae_hmc_tpu.core.config import MelConfig, MfccConfig
from vae_hmc_tpu.parallel.features_dp import (logmel_batch_sharded,
                                              mfcc_stats_batch_sharded)
from vae_hmc_tpu.parallel.mesh import make_mesh


def _waves(rng, b, cfg):
    return rng.normal(0, 0.1, (b, cfg.n_samples)).astype(np.float32)


def test_logmel_sharded_matches_single_device():
    rng = np.random.default_rng(0)
    cfg = MelConfig(duration_s=1.5)
    y = _waves(rng, 16, cfg)              # divisible by the data axis
    from vae_hmc_tpu.ops.mel import logmel_batch

    mesh = make_mesh(8, shape=(8, 1))
    got = np.asarray(logmel_batch_sharded(y, cfg, mesh))
    ref = np.asarray(logmel_batch(jnp.asarray(y), cfg))
    np.testing.assert_array_equal(got, ref)


def test_logmel_sharded_uneven_rows():
    """Row count not divisible by the data axis: zero-padding rows are
    sliced off and real rows are untouched."""
    rng = np.random.default_rng(1)
    cfg = MelConfig(duration_s=1.5)
    y = _waves(rng, 13, cfg)              # 13 % 8 != 0
    from vae_hmc_tpu.ops.mel import logmel_batch

    mesh = make_mesh(8, shape=(8, 1))
    got = np.asarray(logmel_batch_sharded(y, cfg, mesh))
    ref = np.asarray(logmel_batch(jnp.asarray(y), cfg))
    assert got.shape == ref.shape == (13, cfg.n_mels, cfg.n_frames)
    np.testing.assert_array_equal(got, ref)


def test_mfcc_stats_sharded_masked_lengths():
    """The hard preset's variable-length masked stats shard too, with
    padding rows given full length so their discarded stats stay finite."""
    rng = np.random.default_rng(2)
    cfg = MfccConfig(duration_s=1.5, min_duration_s=0.5)
    b = 11                                 # 11 % 8 != 0
    y = _waves(rng, b, cfg)
    lengths = rng.integers(cfg.n_samples // 2, cfg.n_samples,
                           size=(b,)).astype(np.int32)
    for r in range(b):                     # zero the tail past true length
        y[r, int(lengths[r]):] = 0.0
    from vae_hmc_tpu.ops.mfcc import mfcc_stats_batch

    mesh = make_mesh(8, shape=(8, 1))
    got = np.asarray(mfcc_stats_batch_sharded(y, cfg, mesh,
                                              lengths=lengths))
    ref = np.asarray(mfcc_stats_batch(jnp.asarray(y), cfg,
                                      lengths=jnp.asarray(lengths)))
    assert got.shape == (b, 2 * cfg.n_mfcc)
    np.testing.assert_array_equal(got, ref)
    assert np.isfinite(got).all()


class TestFusedSynthPrograms:
    """The fused synth->feature scan (ONE program for the whole corpus —
    the round-4 dispatch-count fix) must match the per-batch path:
    bit-identical waveforms by construction (same synth_core, same fold_in
    keys, threefry prefix property for the padded tail), feature parity to
    f32 fusion tolerance."""

    def _source(self, n):
        from vae_hmc_tpu.pipelines.sources import SyntheticSource
        return SyntheticSource.make(n, seed=42, device=True)

    def test_fused_mfcc_matches_per_batch(self):
        from vae_hmc_tpu.core.config import MfccConfig
        from vae_hmc_tpu.ops.mfcc import mfcc_stats_batch
        from vae_hmc_tpu.pipelines import features, synthetic

        cfg = MfccConfig(duration_s=1.0)
        src = self._source(10)
        x, ids, report = features.build_mfcc_stats(src, cfg, device_batch=4)
        assert x.shape == (10, cfg.feature_dim)
        assert report.ok_count() == 10
        np.testing.assert_array_equal(ids, src.track_ids)
        # reference: the per-batch device path (old code path, exact batch
        # boundaries incl. the short tail batch)
        parts = []
        for s in range(0, 10, 4):
            idx = list(range(s, min(s + 4, 10)))
            wav = synthetic.waveform_batch_device(src.ds, idx, cfg.duration_s,
                                                  seed=42)
            parts.append(np.asarray(mfcc_stats_batch(wav, cfg)))
        ref = np.concatenate(parts)
        np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-4)

    def test_fused_logmel_matches_per_batch(self):
        from vae_hmc_tpu.core.config import MelConfig
        from vae_hmc_tpu.ops import mel as mel_ops
        from vae_hmc_tpu.pipelines import features, synthetic

        cfg = MelConfig(duration_s=1.0)
        src = self._source(7)
        x, ids, report = features.build_logmel(src, cfg, device_batch=4,
                                               hbm_resident=False)
        assert x.shape == (7, 1, cfg.n_mels, cfg.n_frames)
        assert report.ok_count() == 7
        parts = []
        for s in range(0, 7, 4):
            idx = list(range(s, min(s + 4, 7)))
            wav = synthetic.waveform_batch_device(src.ds, idx, cfg.duration_s,
                                                  seed=42)
            m = mel_ops.per_sample_standardize(mel_ops.logmel_batch(wav, cfg))
            parts.append(np.asarray(m))
        ref = np.concatenate(parts)
        np.testing.assert_allclose(x[:, 0], ref, rtol=2e-4, atol=2e-4)

    def test_fused_waveforms_bit_identical_to_per_batch(self):
        """The synthesized waveforms themselves (before any feature kernel)
        are BIT-identical between the scan program and the standalone
        per-batch program, including the padded tail batch."""
        import jax
        import jax.numpy as jnp

        from vae_hmc_tpu.pipelines import features, synthetic

        src = self._source(6)
        n_samp = 2205                                       # 0.1 s
        params, starts = features._stacked_synth_params(src, 6, 4)

        @jax.jit
        def scan_waves(params, starts):
            return features._scan_synth(params, starts, 42, n_samp,
                                        src.sample_rate, lambda w: w)

        got = np.asarray(scan_waves(params, starts)).reshape(-1, n_samp)[:6]
        ref = np.concatenate([
            np.asarray(synthetic.waveform_batch_device(src.ds, idx, 0.1,
                                                       seed=42))
            for idx in ([0, 1, 2, 3], [4, 5])])
        np.testing.assert_array_equal(got, ref)

    def test_fused_sharded_matches_single_device(self):
        """The mesh-sharded fused program (scan + per-step 'data' sharding)
        must reproduce the single-device fused output for both kernels."""
        from vae_hmc_tpu.core.config import MelConfig, MfccConfig
        from vae_hmc_tpu.parallel.features_dp import synth_features_fused_sharded
        from vae_hmc_tpu.parallel.mesh import make_mesh
        from vae_hmc_tpu.pipelines import features

        src = self._source(11)
        mesh = make_mesh(8)                      # 11 rows, batch rounds to 8
        mel_cfg = MelConfig(duration_s=1.0)
        got = np.asarray(synth_features_fused_sharded(
            src, mel_cfg, mesh, device_batch=5, kind="logmel"))
        ref, _, _ = features.build_logmel(src, mel_cfg, device_batch=8,
                                          hbm_resident=True)
        np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-4, atol=2e-4)

        mfcc_cfg = MfccConfig(duration_s=1.0)
        got_m = np.asarray(synth_features_fused_sharded(
            src, mfcc_cfg, mesh, device_batch=5, kind="mfcc"))
        ref_m, _, _ = features.build_mfcc_stats(src, mfcc_cfg, device_batch=8)
        np.testing.assert_allclose(got_m, ref_m, rtol=2e-4, atol=2e-4)
