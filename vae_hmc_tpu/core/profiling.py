"""Tracing / profiling / observability.

The reference has none of this — tqdm bars and prints only (SURVEY.md §5).
Here:
  - StageTimer: per-stage wall-clock accumulation with a JSON report —
    tracks/sec per stage is the framework's headline metric (BASELINE.json);
  - device_trace(): context manager around jax.profiler.trace writing a
    TensorBoard-loadable TPU trace (op-level HLO timings);
  - annotate(): jax.profiler.TraceAnnotation passthrough for labeling spans
    inside a trace;
  - log(): timestamped stderr logging controlled by VAE_HMC_VERBOSE.
"""
from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from pathlib import Path
from typing import Dict, Optional


class StageTimer:
    def __init__(self):
        self.stages: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, n_items: Optional[int] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.stages[name] = self.stages.get(name, 0.0) + dt
            if n_items is not None:
                self.counts[name] = self.counts.get(name, 0) + n_items

    def report(self) -> Dict:
        out: Dict = {"seconds": {k: round(v, 4) for k, v in self.stages.items()},
                     "total_seconds": round(sum(self.stages.values()), 4)}
        rates = {}
        for k, n in self.counts.items():
            if self.stages.get(k):
                rates[k] = round(n / self.stages[k], 2)
        if rates:
            out["items_per_second"] = rates
        return out

    def save(self, path: Path) -> Path:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(self.report(), indent=2))
        return path


@contextlib.contextmanager
def device_trace(log_dir: Path):
    """TPU/HLO-level trace viewable in TensorBoard / Perfetto."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


def log(msg: str) -> None:
    if os.environ.get("VAE_HMC_VERBOSE"):
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr)


def warm_connection(timer: Optional["StageTimer"] = None) -> float:
    """Pay the device runtime's per-process first-dispatch cost on a trivial
    program and return the seconds it took.

    On tunneled dev devices the first dispatched program of a process can
    stall minutes in connection setup (measured 96-202 s on the dev chip;
    ~0 s when the service is warm).  Calling this at pipeline start pins
    that cost to its own `connect` stage so every real stage in
    timing_<tier>.json measures pipeline work, not tunnel weather.  Synced
    by a scalar fetch — block_until_ready is unreliable on async tunneled
    platforms.
    """
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((4,), jnp.float32)))
    dt = time.perf_counter() - t0
    if timer is not None:
        timer.stages["connect"] = timer.stages.get("connect", 0.0) + dt
    return dt
