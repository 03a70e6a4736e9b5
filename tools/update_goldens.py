"""Merge freshly certified quality columns into QUALITY_GOLDENS.json.

Usage:
  # from a completed tier run's workspace:
  python tools/update_goldens.py --tier medium --results runs/med/results --n 2924
  # from a bench.py JSON line (file or stdin):
  python bench.py | tail -1 | python tools/update_goldens.py --bench -

The platform component of the key is taken from the CURRENT process's jax
backend — run this on the same backend that produced the artifacts.
Intended workflow for a deliberate numerics change: re-certify on TPU, run
this tool, and commit the goldens update TOGETHER with the code change so
the diff carries the justification.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vae_hmc_tpu.core import goldens  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tier", choices=["easy", "medium", "hard"])
    ap.add_argument("--results", type=Path,
                    help="workspace results/ dir of a completed tier run")
    ap.add_argument("--n", type=int, help="track count of the certified run")
    ap.add_argument("--bench", help="bench.py JSON line file, or - for stdin")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    if args.bench:
        raw = (sys.stdin.read() if args.bench == "-"
               else Path(args.bench).read_text())
        result = json.loads(raw.strip().splitlines()[-1])
        mode = "fast" if "fast" in result.get("mode", "") else "parity"
        key = goldens.golden_key("bench", result["n_tracks"], mode)
        observed = goldens.extract_bench(result)
    elif args.tier:
        if not (args.results and args.n):
            ap.error("--tier requires --results and --n")
        key = goldens.golden_key(args.tier, args.n)
        observed = goldens._EXTRACTORS[args.tier](args.results)
    else:
        ap.error("pass --tier or --bench")
        return

    path = goldens.goldens_path()
    data = goldens.load_goldens(path)
    prev = data.get(key)
    data[key] = observed
    print(f"{'would update' if args.dry_run else 'updated'} [{key}] "
          f"({'replacing existing entry' if prev is not None else 'new'}, "
          f"{len(observed)} rows) in {path}")
    if prev is not None and prev != observed:
        res = goldens.check(key, observed, {key: prev})
        for m in res["mismatches"]:
            print(f"  changed: {m}")
    if not args.dry_run:
        path.write_text(json.dumps(data, indent=2, sort_keys=True) + "\n")


if __name__ == "__main__":
    main()
