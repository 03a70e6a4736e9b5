"""Aux subsystems: profiling timers, checkpoint/resume, artifacts."""
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_hmc_tpu.core import artifacts
from vae_hmc_tpu.core.profiling import StageTimer
from vae_hmc_tpu.models.dense_vae import DenseVAE
from vae_hmc_tpu.models.train import fit


def test_stage_timer_report(tmp_path):
    t = StageTimer()
    with t.stage("features", n_items=100):
        pass
    with t.stage("train"):
        pass
    rep = t.report()
    assert set(rep["seconds"]) == {"features", "train"}
    assert "features" in rep.get("items_per_second", {})
    p = t.save(tmp_path / "prof.json")
    assert json.loads(p.read_text())["total_seconds"] >= 0


def _setup(rng):
    x = rng.normal(0, 1, (120, 10)).astype(np.float32)
    model = DenseVAE(input_dim=10, hidden_dims=(16,), latent_dim=3)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 10)), key)

    def apply_fn(p, r, xb):
        return model.apply(p, xb, r)
    return x, params, apply_fn


def test_training_resume_continues_history(tmp_path, rng):
    x, params, apply_fn = _setup(rng)
    kw = dict(batch_size=40, learning_rate=1e-3, seed=0,
              checkpoint_dir=str(tmp_path), checkpoint_every=1)
    # train 3 epochs with checkpointing
    r1 = fit(apply_fn, params, (x,), epochs=3, **kw)
    # "crash" and resume to 6 epochs: must pick up at epoch 4
    r2 = fit(apply_fn, params, (x,), epochs=6, **kw)
    assert [h["epoch"] for h in r2.history] == [1, 2, 3, 4, 5, 6]
    # first 3 rows are the restored history
    assert r2.history[:3] == r1.history


def test_resume_equivalent_to_straight_run(tmp_path, rng):
    """resumed(3+3) must equal uninterrupted(6) exactly (same RNG schedule)."""
    x, params, apply_fn = _setup(rng)
    straight = fit(apply_fn, params, (x,), epochs=6, batch_size=40,
                   learning_rate=1e-3, seed=0)
    kw = dict(batch_size=40, learning_rate=1e-3, seed=0,
              checkpoint_dir=str(tmp_path), checkpoint_every=3)
    fit(apply_fn, params, (x,), epochs=3, **kw)
    resumed = fit(apply_fn, params, (x,), epochs=6, **kw)
    for a, b in zip(straight.history, resumed.history):
        assert a["total"] == pytest.approx(b["total"], rel=1e-5)
    leaves_a = jax.tree_util.tree_leaves(straight.params)
    leaves_b = jax.tree_util.tree_leaves(resumed.params)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)


def test_tagged_snapshot(tmp_path):
    p = artifacts.save_json(tmp_path / "m.json", {"a": 1}, tag="v2")
    assert (tmp_path / "m.json").exists()
    assert (tmp_path / "m_v2.json").exists()
    assert artifacts.tagged_path(Path("x/y.csv"), "t") == Path("x/y_t.csv")


def test_feature_pair_validation(tmp_path):
    x = np.zeros((4, 3))
    ids = np.arange(4)
    xp, ip = artifacts.save_features(tmp_path / "f_X.npy", x, ids)
    x2, ids2 = artifacts.load_features(xp, ip)
    assert x2.shape == (4, 3)
    with pytest.raises(ValueError):
        artifacts.save_features(tmp_path / "g_X.npy", x, ids[:2])


def test_tier_runners_write_timing_reports(tmp_path):
    """Every tier run writes a per-stage wall-clock report (observability —
    SURVEY.md §5; the reference has tqdm bars only)."""
    import json

    from vae_hmc_tpu.core.config import (DenseVaeConfig, KMeansConfig,
                                         MfccConfig, Workspace)
    from vae_hmc_tpu.pipelines import easy
    from vae_hmc_tpu.pipelines.sources import SyntheticSource

    ws = Workspace(tmp_path)
    src = SyntheticSource.make(16, seed=0, lyrics_coverage=1.0)
    out = easy.run_easy_pipeline(
        src, ws, MfccConfig(duration_s=1.0),
        DenseVaeConfig(latent_dim=4, epochs=2, batch_size=8),
        KMeansConfig(n_clusters=3, n_init=2), with_viz=False)
    rep = json.loads((ws.results / "timing_easy.json").read_text())
    assert set(rep["seconds"]) == {"connect", "train_basic_vae",
                                   "cluster_easy", "compare_pca_baseline"}
    assert rep["total_seconds"] > 0
    assert out["timing"]["items_per_second"]["train_basic_vae"] > 0


def test_warm_connection_records_connect_stage():
    from vae_hmc_tpu.core.profiling import StageTimer, warm_connection

    timer = StageTimer()
    dt = warm_connection(timer)
    assert dt >= 0.0
    assert "connect" in timer.stages
    # accumulates rather than overwrites
    warm_connection(timer)
    assert timer.stages["connect"] >= dt


def test_real_data_readiness_tool_runs_green():
    """tools/real_data_readiness.py must exit 0 and emit valid JSON whether
    or not any real data is mounted ("blocked" is the expected CI state) —
    VERDICT r3 next-step #7."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    tool = Path(__file__).resolve().parents[1] / "tools" / "real_data_readiness.py"
    cp = subprocess.run([sys.executable, str(tool)], capture_output=True,
                        text=True, timeout=120)
    assert cp.returncode == 0, cp.stderr
    report = json.loads(cp.stdout)
    names = {c["name"] for c in report["checks"]}
    assert names == {"FMA audio corpus", "MiniLM real weights",
                     "Whisper real model", "Live lyrics APIs"}
    assert set(report["ready"]) | set(report["blocked"]) == names
    for c in report["checks"]:
        assert c["next_step"]
