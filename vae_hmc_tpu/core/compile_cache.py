"""Persistent XLA compilation-cache switch shared by every CLI/bench/tool
entry point (one definition instead of a copy-pasted preamble in each
script).

Every program in the framework is static-shape, so a warm cache turns the
multi-minute first-compile of the fused train program into a file load.

STALE-CACHE SENTINEL (round-5 verdict item 4): a cache entry compiled by an
older toolchain/compile-service stays key-valid forever and was measured
~6x SLOWER than a fresh compile of the identical HLO (CLAUDE.md round-2
hazard: 147 vs 26 ms/step on the fused train program).  Until round 5 the
only defense was a human remembering to `rm -rf` the cache.  Now the cache
dir carries a provenance stamp (jax/jaxlib/libtpu versions + a fingerprint
of the PJRT-plugin tree that serves remote compiles); on mismatch the stale
cache is moved aside (``<dir>.stale-<ts>``) and a fresh one is started, so
old-toolchain entries can never silently poison certified numbers again.
Set VAE_HMC_KEEP_STALE_CACHE=1 to warn without invalidating (forensics).

The stamp is computed WITHOUT touching the JAX backend — during a tunnel
outage ``jax.devices()`` hangs (CLAUDE.md), and this module runs in every
process before the outage probe.
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import jax

_PLUGIN_DIRS = ("/root/.axon_site/axon",)
PROVENANCE_FILENAME = "provenance.json"


def _plugin_fingerprint() -> str:
    """Hash of (path, size, mtime) for the PJRT plugin tree: changes when
    the plugin/compile-service client is updated, costs only stat calls."""
    h = hashlib.sha256()
    for root in _PLUGIN_DIRS:
        if not os.path.isdir(root):
            continue
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            for fn in sorted(filenames):
                p = os.path.join(dirpath, fn)
                try:
                    st = os.stat(p)
                except OSError:
                    continue
                h.update(f"{p}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]


def provenance_stamp() -> dict:
    try:
        import importlib.metadata as md
        libtpu = md.version("libtpu")
    except Exception:
        libtpu = "absent"
    import jaxlib
    return {
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "libtpu": libtpu,
        "plugin_fingerprint": _plugin_fingerprint(),
    }


def _check_provenance(path: str, stamp: dict) -> str:
    """Returns 'fresh' | 'match' | 'invalidated' | 'kept-stale'."""
    os.makedirs(path, exist_ok=True)
    stamp_path = os.path.join(path, PROVENANCE_FILENAME)
    try:
        on_disk = json.loads(open(stamp_path).read())
    except (OSError, ValueError):
        on_disk = None
    if on_disk == stamp:
        return "match"
    if on_disk is not None:
        mism = {k: (on_disk.get(k), v) for k, v in stamp.items()
                if on_disk.get(k) != v}
        if os.environ.get("VAE_HMC_KEEP_STALE_CACHE") == "1":
            print(f"[compile-cache] WARNING: stale cache kept at {path} "
                  f"(toolchain changed: {mism}); entries may be ~6x slower "
                  "than fresh compiles", file=sys.stderr)
            return "kept-stale"
        aside = f"{path}.stale-{int(time.time())}"
        try:
            os.replace(path, aside)
        except OSError as e:
            print(f"[compile-cache] WARNING: stale cache at {path} "
                  f"(toolchain changed: {mism}) could not be moved aside "
                  f"({e}); delete it manually", file=sys.stderr)
            return "kept-stale"
        os.makedirs(path, exist_ok=True)
        print(f"[compile-cache] toolchain changed ({mism}); stale cache "
              f"moved to {aside}, starting fresh", file=sys.stderr)
        result = "invalidated"
    else:
        result = "fresh"
    try:
        tmp = stamp_path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(stamp, f, indent=2)
        os.replace(tmp, stamp_path)
    except OSError:
        pass  # racing process already stamped; next call re-verifies
    return result


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 0.5) -> str:
    """Point JAX at the repo's persistent compilation cache (with the
    provenance sentinel above); returns the directory used.  Safe to call
    more than once."""
    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/vae_hmc_jax_cache"))
    _check_provenance(path, provenance_stamp())
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
