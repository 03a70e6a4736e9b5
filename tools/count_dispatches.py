"""Count compiled-program dispatches per pipeline stage.

Under tunnel congestion each device dispatch costs ~0.5-1 s regardless of
its compute, so the dispatch COUNT of a stage bounds its congested-weather
wall clock (round-3 finding: easy train_basic_vae at ~92 dispatches ran
88-146 s congested).  This tool runs a tier on the CPU backend with
`pxla.ExecuteReplicated.__call__` instrumented and prints dispatches per
stage — the structural number the round-4 fused programs exist to shrink.

Per-program attribution (round-5 verdict item 8): each stage row is
followed by which compiled programs dispatched and how often, so the next
dispatch diet is measured, not guessed.

Run: JAX_PLATFORM_NAME=cpu python tools/count_dispatches.py [easy|medium|hard] [N]
"""
from __future__ import annotations

import collections
import sys
import tempfile
from pathlib import Path


# Run as a script from anywhere: put the repo root on sys.path (the dev
# container's site-packages .pth is not guaranteed to exist).
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import vae_hmc_tpu  # noqa: F401  (platform shim before jax backend init)
import jax

from jax._src.interpreters import pxla

_COUNT = [0]
_PROGS: collections.Counter = collections.Counter()
_orig = pxla.ExecuteReplicated.__call__


def _patched(self, *a, **k):
    _COUNT[0] += 1
    _PROGS[self.name] += 1
    return _orig(self, *a, **k)


pxla.ExecuteReplicated.__call__ = _patched


class StageCounter:
    def __init__(self):
        self.stages = {}
        self.progs = {}

    def mark(self, name):
        self.stages[name] = _COUNT[0]
        self.progs[name] = dict(_PROGS)

    def report(self):
        names = list(self.stages)
        print(f"\n{'stage':<38}{'dispatches':>10}")
        prev, prev_progs = 0, {}
        for n in names:
            d = self.stages[n] - prev
            prev = self.stages[n]
            print(f"{n:<38}{d:>10}")
            cur = self.progs[n]
            delta = collections.Counter(cur)
            delta.subtract(prev_progs)
            prev_progs = cur
            for prog, cnt in sorted(((p, c) for p, c in delta.items()
                                     if c > 0), key=lambda t: -t[1]):
                print(f"    {prog[:60]:<60}{cnt:>6}")
        print(f"{'TOTAL':<38}{prev:>10}")


def main():
    tier = sys.argv[1] if len(sys.argv) > 1 else "easy"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    print(f"backend: {jax.default_backend()}  tier={tier}  n={n}",
          file=sys.stderr)

    from vae_hmc_tpu.core.config import (DenseVaeConfig, HardVaeConfig,
                                         KMeansConfig, MelConfig, MfccConfig,
                                         ConvMMVaeConfig, Workspace)
    from vae_hmc_tpu.pipelines.sources import SyntheticSource

    # device=True so the fused synth->feature path is active, as on TPU
    src = SyntheticSource.make(n, seed=42, device=True)
    sc = StageCounter()
    with tempfile.TemporaryDirectory() as td:
        ws = Workspace(Path(td))
        if tier == "easy":
            from vae_hmc_tpu.pipelines import easy
            mf = MfccConfig(duration_s=1.5)
            t = easy.train_basic_vae(src, ws, mf, DenseVaeConfig(epochs=2))
            sc.mark("train_basic_vae (06)")
            easy.cluster_easy(ws, KMeansConfig(n_clusters=5),
                              latents=t["latents"], track_ids=t["track_ids"])
            sc.mark("cluster_easy (07)")
            easy.visualize_easy(ws)
            sc.mark("visualize_easy (08)")
            easy.compare_pca_baseline(ws, KMeansConfig(n_clusters=5))
            sc.mark("compare_pca_baseline (09)")
        elif tier == "medium":
            # per-stage breakdown for free: run_medium_pipeline already
            # wraps every stage in StageTimer.stage(name) — mark the
            # dispatch counter at each stage exit
            import contextlib

            from vae_hmc_tpu.core import profiling
            _orig_stage = profiling.StageTimer.stage

            @contextlib.contextmanager
            def _counting_stage(self, name, n_items=None):
                with _orig_stage(self, name, n_items):
                    yield
                sc.mark(name)

            profiling.StageTimer.stage = _counting_stage
            from vae_hmc_tpu.pipelines import medium
            gm = {int(t_): str(g) for t_, g in zip(src.track_ids, src.genres)}
            medium.run_medium_pipeline(
                src, ws, mel_cfg=MelConfig(duration_s=1.5),
                vae_cfg=ConvMMVaeConfig(
                    epochs=2, in_frames=MelConfig(duration_s=1.5).n_frames),
                write_mel_features=False)
            profiling.StageTimer.stage = _orig_stage
            sc.mark("(outside stages)")
        elif tier == "hard":
            from vae_hmc_tpu.pipelines import hard
            mf = MfccConfig(duration_s=1.5, min_duration_s=1.0)
            hard.prepare_features(src, ws, mfcc_cfg=mf)
            sc.mark("prepare_features (18)")
            hard.train_hard(ws, HardVaeConfig(epochs=2))
            sc.mark("train_hard (19)")
            hard.cluster_and_evaluate(ws)
            sc.mark("cluster_and_evaluate (20)")
            hard.visualize_latents(ws)
            sc.mark("visualize_latents (21)")
            hard.compare_with_baselines(ws)
            sc.mark("compare_with_baselines (22)")
        else:
            raise SystemExit(f"unknown tier {tier}")
    sc.report()


if __name__ == "__main__":
    main()
