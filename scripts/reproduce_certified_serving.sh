#!/bin/bash
# Reproduce the certified serving rows ON-CHIP from committed artifacts only.
#
# `BENCH_MODE=serving` with no overrides resolves the certified row for
# BENCH_GUIDE_W through serving.py (committed checkpoint weights, certified
# strided step count, matching spectral calibration, all
# fingerprint-verified) — so these two runs demonstrate the certified
# 1201.5 (w=0) / 722 (w=2) maps/min configurations reproduce end-to-end
# from the repo alone.  Results land in artifacts/diagnostics_r5/ and are
# cited from README's benchmarks section.
#
# Requires the exclusive TPU chip (CLAUDE.md) — do not run while another
# TPU process (e.g. a certification run) is active.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=artifacts/diagnostics_r5
mkdir -p "$OUT"
for w in 0 2; do
  echo "=== BENCH_MODE=serving BENCH_GUIDE_W=$w (certified-row resolver) ==="
  BENCH_MODE=serving BENCH_GUIDE_W=$w timeout 900 python bench.py \
    > "$OUT/serving_repro_w${w}.json" \
    || { echo "serving reproduction w=$w failed"; exit 1; }
  cat "$OUT/serving_repro_w${w}.json"
done
echo "committed: $OUT/serving_repro_w{0,2}.json"
