"""Backend-probe / bench-outage-proofing tests (core.backend).

Round-3 post-mortem: the driver bench died with rc=1 when `jax.devices()`
hung during a tunnel outage.  These tests pin the guard rails: a bounded
subprocess probe that cannot hang the caller, bounded retry, and the
committed BENCH_LOCAL.jsonl record.
"""
import json

from vae_hmc_tpu.core import backend


def test_probe_success_cpu(monkeypatch):
    monkeypatch.setenv("VAE_HMC_PROBE_PLATFORM", "cpu")
    s = backend.probe_backend(timeout_s=120)
    assert s.ok, s.error
    assert s.platform == "cpu"
    assert s.n_devices >= 1


def test_probe_failure_bad_platform(monkeypatch):
    monkeypatch.setenv("VAE_HMC_PROBE_PLATFORM", "no_such_platform")
    s = backend.probe_backend(timeout_s=120)
    assert not s.ok
    assert "rc=" in s.error


def test_wait_for_backend_budget_exhaustion(monkeypatch):
    calls = []

    def fake_probe(timeout_s):
        calls.append(timeout_s)
        return backend.BackendStatus(ok=False, error="simulated outage")

    monkeypatch.setattr(backend, "probe_backend", fake_probe)
    s = backend.wait_for_backend(total_budget_s=0.5, probe_timeout_s=1.0)
    assert not s.ok
    assert s.attempts == len(calls) >= 1
    assert "simulated outage" in s.error


def test_wait_for_backend_eventual_success(monkeypatch):
    outcomes = [backend.BackendStatus(ok=False, error="down"),
                backend.BackendStatus(ok=True, platform="tpu",
                                      device_kind="fake", n_devices=1)]
    monkeypatch.setattr(backend, "probe_backend",
                        lambda timeout_s: outcomes.pop(0))
    monkeypatch.setattr(backend.time, "sleep", lambda s: None)
    s = backend.wait_for_backend(total_budget_s=60.0)
    assert s.ok and s.attempts == 2


def test_record_and_last_known_good(tmp_path):
    p = tmp_path / "BENCH_LOCAL.jsonl"
    assert backend.last_known_good(p) is None
    backend.record_bench({"metric": "m", "value": 1.0}, path=p)
    backend.record_bench({"metric": "m", "value": 2.5}, path=p)
    lines = p.read_text().splitlines()
    assert len(lines) == 2
    last = backend.last_known_good(p)
    assert last["value"] == 2.5
    assert "ts" in last
    # every line is valid standalone JSON
    for ln in lines:
        json.loads(ln)
