#!/bin/bash
# Round-4 TPU re-certification campaign — one command for when the tunnel
# returns after an outage.  Runs every measurement the round's CPU-verified
# changes still owe a real-chip number (CLAUDE.md round-4 roadmap):
#
#   1. backend probe (bounded — aborts the campaign if the tunnel is down)
#   2. bench.py warm x3 (appends BENCH_LOCAL.jsonl; driver-format JSON)
#   3. full medium tier timed at 2924 (timing_medium.json: the <=110 s
#      warm target, fetch-restructure + dispatch-diet effects)
#   4. easy + hard tiers timed at 2924 (the fused feature-scan programs:
#      easy train stage target <=25 s even under congestion)
#   5. profile_fetch.py (single-buffer vs per-leaf checkpoint fetch)
#   6. quality re-certification: medium metrics CSV vs the round-3
#      certified values (centered_euclidean_dists moves silhouette at the
#      5th decimal — labels/ARI/DBI must be unchanged)
#
# STALE-CACHE HAZARD (CLAUDE.md): if step 2's warm number is inexplicably
# slow vs BENCH_r03/BENCH_LOCAL.jsonl, rm -rf ~/.cache/vae_hmc_jax_cache
# and rerun before concluding anything about the code.
#
# Run: bash tools/tpu_recert.sh [outdir]   (default /tmp/tpu_recert)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_recert}
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/campaign.log"; }

log "=== 1. backend probe ==="
timeout 300 python -c "from vae_hmc_tpu.core import backend; s = backend.probe_backend(); print(s); raise SystemExit(0 if s.ok else 1)" 2>&1 | tee -a "$OUT/campaign.log"
if [ "${PIPESTATUS[0]}" != "0" ]; then
  log "backend unavailable — aborting campaign"
  exit 1
fi

log "=== 2. bench warm x3 ==="
for i in 1 2 3; do
  log "bench run $i"
  timeout 1800 python bench.py 2>"$OUT/bench_$i.err" | tee "$OUT/bench_$i.json" | tee -a "$OUT/campaign.log"
done

log "=== 3. medium tier timed (2924, full viz) ==="
timeout 2400 python tools/run_medium_timed.py --n 2924 --out "$OUT/medium_ws" \
  2>&1 | tail -40 | tee -a "$OUT/campaign.log"
cp "$OUT/medium_ws/results/timing_medium.json" "$OUT/" 2>/dev/null

log "=== 4. easy + hard tiers timed (2924) ==="
timeout 2400 python -m vae_hmc_tpu.cli run-easy --synthetic 2924 \
  --root "$OUT/easy_ws" 2>&1 | tail -15 | tee -a "$OUT/campaign.log"
cp "$OUT/easy_ws/results/timing_easy.json" "$OUT/" 2>/dev/null
timeout 2400 python -m vae_hmc_tpu.cli run-hard --synthetic 2924 \
  --root "$OUT/hard_ws" 2>&1 | tail -15 | tee -a "$OUT/campaign.log"
cp "$OUT/hard_ws/results/timing_hard.json" "$OUT/" 2>/dev/null

log "=== 5. checkpoint fetch profile ==="
timeout 1800 python tools/profile_fetch.py 2>&1 | tee -a "$OUT/campaign.log"

log "=== 6. quality re-certification ==="
python - "$OUT" <<'EOF' 2>&1 | tee -a "$OUT/campaign.log"
import csv, json, sys
from pathlib import Path
out = Path(sys.argv[1])
p = out / "medium_ws/results/medium_clustering_metrics_all.csv"
if p.exists():
    rows = list(csv.DictReader(open(p)))
    for r in rows[:6]:
        print({k: r[k] for k in list(r)[:7]})
else:
    print("metrics CSV missing:", p)
for t in ("timing_medium.json", "timing_easy.json", "timing_hard.json"):
    f = out / t
    if f.exists():
        d = json.load(open(f))
        tot = sum(s.get("seconds", 0) for s in d.get("stages", d) if isinstance(s, dict)) if isinstance(d, list) else None
        print(t, "->", json.dumps(d)[:400])
EOF

log "campaign done — artifacts in $OUT"
