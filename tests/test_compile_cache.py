"""Stale-cache provenance sentinel (core/compile_cache.py).

Round-5 verdict item 4: the documented 6x stale-entry hazard must be
defended mechanically, not by a human remembering to rm -rf the cache.
These tests exercise _check_provenance directly (enable_persistent_cache
would repoint this test process's live compile-cache config).
"""
import json
import os

from vae_hmc_tpu.core import compile_cache as cc


def test_stamp_is_deterministic_and_versioned():
    s1, s2 = cc.provenance_stamp(), cc.provenance_stamp()
    assert s1 == s2
    import jax
    assert s1["jax"] == jax.__version__
    assert set(s1) == {"jax", "jaxlib", "libtpu", "plugin_fingerprint"}


def test_fresh_dir_gets_stamped(tmp_path):
    d = str(tmp_path / "cache")
    assert cc._check_provenance(d, cc.provenance_stamp()) == "fresh"
    stamp = json.loads(open(os.path.join(d, cc.PROVENANCE_FILENAME)).read())
    assert stamp == cc.provenance_stamp()
    # second call on the same toolchain: match, nothing moved
    assert cc._check_provenance(d, cc.provenance_stamp()) == "match"


def test_mismatched_stamp_invalidates(tmp_path, capsys):
    d = str(tmp_path / "cache")
    stamp = cc.provenance_stamp()
    cc._check_provenance(d, stamp)
    (tmp_path / "cache" / "some-entry-cache").write_text("old toolchain")
    doctored = dict(stamp, jax="0.0.1-old")
    with open(os.path.join(d, cc.PROVENANCE_FILENAME), "w") as f:
        json.dump(doctored, f)
    assert cc._check_provenance(d, stamp) == "invalidated"
    err = capsys.readouterr().err
    assert "toolchain changed" in err and "moved to" in err
    # the stale entries were moved aside, not deleted; fresh dir re-stamped
    stale_dirs = [p for p in tmp_path.iterdir()
                  if p.name.startswith("cache.stale-")]
    assert len(stale_dirs) == 1
    assert (stale_dirs[0] / "some-entry-cache").read_text() == "old toolchain"
    assert not (tmp_path / "cache" / "some-entry-cache").exists()
    assert cc._check_provenance(d, stamp) == "match"


def test_keep_stale_env_warns_only(tmp_path, capsys, monkeypatch):
    monkeypatch.setenv("VAE_HMC_KEEP_STALE_CACHE", "1")
    d = str(tmp_path / "cache")
    stamp = cc.provenance_stamp()
    cc._check_provenance(d, stamp)
    with open(os.path.join(d, cc.PROVENANCE_FILENAME), "w") as f:
        json.dump(dict(stamp, libtpu="0.0.1-old"), f)
    assert cc._check_provenance(d, stamp) == "kept-stale"
    assert "stale cache kept" in capsys.readouterr().err
    assert not [p for p in tmp_path.iterdir()
                if p.name.startswith("cache.stale-")]
