"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip hardware is unavailable in CI; sharding tests run on 8 virtual
CPU devices (SURVEY.md §4).  Config-based (jax_num_cpu_devices) rather than
XLA_FLAGS: jaxlib's C extension parses XLA_FLAGS at load time and pytest's
plugin discovery imports jaxlib before this conftest runs, so env vars set
here would be ignored.  jax.config.update works any time before backend
initialization.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache for the CPU suite (separate dir from the TPU
# cache): the full-resolution DP+TP conv test alone costs ~430 s of XLA
# CPU compile on this 1-core host — paid once, then reruns of the suite
# load it in seconds.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/vae_hmc_jax_cache_cputests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--full-res", action="store_true", default=False,
        help="run tests marked full_res (~400 s of XLA CPU compile for the "
             "full-resolution sharded conv program)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "full_res: full-resolution sharded-program test (~400 s XLA CPU "
        "compile; run with --full-res or VAE_HMC_FULL_RES=1 — MUST be run "
        "before certifying a round / touching models.train or parallel.*)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--full-res") or os.environ.get("VAE_HMC_FULL_RES"):
        return
    skip = pytest.mark.skip(
        reason="full_res: pass --full-res (or VAE_HMC_FULL_RES=1); ~400 s "
               "XLA CPU compile, coverage still required before round cert")
    for item in items:
        if "full_res" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
