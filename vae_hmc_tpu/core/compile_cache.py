"""Persistent XLA compilation-cache switch shared by the bench/tools entry
points (one definition instead of a copy-pasted preamble in each script).

Every program in the framework is static-shape, so a warm cache turns the
multi-minute first-compile of the fused train program into a file load;
see CLAUDE.md for the stale-cache and giant-executable hazards.
"""
from __future__ import annotations

import os

import jax


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 0.5) -> str:
    """Point JAX at the repo's persistent compilation cache; returns the
    directory used.  Safe to call more than once."""
    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/vae_hmc_jax_cache"))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
