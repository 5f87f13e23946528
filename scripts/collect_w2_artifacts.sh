#!/bin/bash
# Collect the w=2 certification pipeline's outputs into the committed
# artifact set (artifacts/certification/) and print the doc-table rows.
# Run after scripts/run_w2_certification.sh completes.
set -euo pipefail
cd "$(dirname "$0")/.."
SWEEP=${W2_SWEEP:-/tmp/cert_r3_w2}
VAL=${W2_VAL:-/tmp/cert_r3_w2_val}
CALIB=${W2_CALIB_DIR:-/tmp}
DEST=artifacts/certification

cp -f "$SWEEP/certification.json" "$DEST/sweep_w2_n4096.json"
cp -f "$SWEEP/certification.md" "$DEST/sweep_w2_n4096.md"
cp -f "$VAL/certification.json" "$DEST/validation_w2_calibrated.json"
cp -f "$VAL/certification.md" "$DEST/validation_w2_calibrated.md"
cp -f "$CALIB"/calib_w2_*.npz "$DEST/" 2>/dev/null || true

python - <<'EOF'
import json

for name in ("sweep_w2_n4096", "validation_w2_calibrated"):
    d = json.load(open(f"artifacts/certification/{name}.json"))
    print(f"\n=== {name} (floor {d['noise_floor_max_pct']}% max, "
          f"tolerance {d['certify_tolerance_pct']}%) ===")
    print("| Config | maps/min/chip | max err | mean err |")
    print("|---|---|---|---|")
    for r in d["rows"]:
        print(f"| {r['config']} | {r['maps_per_min']:.0f} | "
              f"{r['max_err_vs_ddpm1500_pct']:.2f}% | "
              f"{r['mean_err_vs_ddpm1500_pct']:.2f}% |"
              + (f"  <- {r['note']}" if r.get("note") else ""))
    print("certified:", d.get("certified_configs"))
EOF
