#!/bin/bash
# One-command TPU hardware session: parity first (a perf number for a wrong
# kernel is worse than none), then the config scans, then the bench.
# Jobs are strictly serialized — two processes sharing the one tunneled v5e
# chip stall each other into timeouts (PERF_NOTES "Measurement pitfalls").
#
# Usage: bash scripts/hw_session.sh [outdir]   (default /tmp/hw_session)
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/hw_session}"
mkdir -p "$OUT"

run() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  timeout 3600 "$@" 2>&1 | tee "$OUT/$name.log"
  echo "=== $name exit: ${PIPESTATUS[0]} ==="
}

run tpu_parity python scripts/tpu_parity.py TPU_PARITY.json
run scan_skip  python scripts/scan_skip.py
run scan_sort  python scripts/scan_sort.py --engines argsort,count
run bench      python bench.py
echo "Artifacts in $OUT; TPU_PARITY.json updated in repo root."
echo "Next: pick the best (tile, C, skip, split) from scan_skip, flip the"
echo "defaults in models/scene.py + cluster.py, re-run bench.py + "
echo "scripts/bench_scenes.py, update BENCHMARKS.md / PERF_NOTES.md."
