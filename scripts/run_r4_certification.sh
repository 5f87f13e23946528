#!/bin/bash
# Round-4 certification rebuild: the FULL chain (w=2 AND w=0, stage A sweep ->
# calibration fits -> stage B out-of-sample validation -> independent-seed
# rescoring) on the COMMITTED reference-scale checkpoint
# (artifacts/certification/model/train_state.msgpack), then collect the
# self-consistent artifact set into artifacts/certification/.
#
# Why: the round-3 committed stage-A/B artifacts were fitted to a checkpoint
# that was later lost to the /tmp wipe; calibrations are model-specific, so
# the whole chain must be re-run against the committed model.  Round-4
# stamping (checkpoint_fingerprint in every json and calib npz, verified by
# certify_fast_sampler --calibrated and bench.py) makes that failure mode a
# hard error from now on.
#
# ~3-3.5 h on one v5e chip.  Resumable: the certifier caches per-config
# spectra in each outdir's pk_cache, keyed by checkpoint+protocol.
# Usage: scripts/run_r4_certification.sh
set -euo pipefail
cd "$(dirname "$0")/.."
SRC=${R4_SRC:-artifacts/certification/model/train_state.msgpack}
CAL=${R4_CALIB_DIR:-/tmp/cert_r4_calib}
EVAL_MAPS=${R4_EVAL_MAPS:-4096}
T=${R4_TIMESTEPS:-1500}
EPOCHS=${R4_EPOCHS:-300}
EXTRA=${R4_EXTRA:---param-sets 1000}
W2_STEPS_LIST=${R4_W2_STEPS:-"440 500 560 620 680 750 900"}
W0_STEPS_LIST=${R4_W0_STEPS:-"430 440 460"}
mkdir -p "$CAL"

# The source checkpoint must be COMPLETE (epoch == EPOCHS): a partial
# checkpoint would silently resume training inside stage A, changing the
# weights so the other outdirs' copies (and later the committed model) no
# longer match — the stamp guards would then hard-fail stage B an hour in.
# (Round-4 incident: the round-3 committed "300-epoch" model was an
# epoch-140 autosave.)
python - "$SRC" "$EPOCHS" <<'EOF'
import sys
from flax import serialization
with open(sys.argv[1], "rb") as f:
    d = serialization.msgpack_restore(f.read())
ep, want = int(d["epoch"]), int(sys.argv[2])
if ep != want:
    raise SystemExit(
        f"{sys.argv[1]} is an epoch-{ep} checkpoint, not {want} — finish "
        f"training first: python scripts/certify_fast_sampler.py <outdir> "
        f"{want} --train-only --param-sets 1000 --timesteps 1500"
    )
print(f"checkpoint complete: epoch {ep}")
EOF

for d in /tmp/cert_r4_w2 /tmp/cert_r4_w2_val /tmp/cert_r4_w0 /tmp/cert_r4_w0_val; do
  mkdir -p "$d"
  cp -f "$SRC" "$d/train_state.msgpack"
done

echo "=== w=2 chain (stage A + fits + stage B) ==="
W2_GUIDE=2 W2_SWEEP=/tmp/cert_r4_w2 W2_VAL=/tmp/cert_r4_w2_val \
  W2_CALIB_DIR="$CAL" W2_EVAL_MAPS="$EVAL_MAPS" W2_TIMESTEPS="$T" \
  W2_EPOCHS="$EPOCHS" W2_STEPS="$W2_STEPS_LIST" W2_EXTRA="$EXTRA" \
  bash scripts/run_w2_certification.sh
python scripts/rescore_validation.py /tmp/cert_r4_w2/certification.json \
  /tmp/cert_r4_w2_val/certification.json \
  -o /tmp/cert_r4_w2_val/certification.indep.json

echo "=== w=0 chain (stage A + fits + stage B) ==="
W2_GUIDE=0 W2_SWEEP=/tmp/cert_r4_w0 W2_VAL=/tmp/cert_r4_w0_val \
  W2_CALIB_DIR="$CAL" W2_EVAL_MAPS="$EVAL_MAPS" W2_TIMESTEPS="$T" \
  W2_EPOCHS="$EPOCHS" W2_STEPS="$W0_STEPS_LIST" W2_EXTRA="$EXTRA" \
  bash scripts/run_w2_certification.sh
python scripts/rescore_validation.py /tmp/cert_r4_w0/certification.json \
  /tmp/cert_r4_w0_val/certification.json \
  -o /tmp/cert_r4_w0_val/certification.indep.json

echo "=== collecting the committed artifact set ==="
DEST=artifacts/certification
cp -f /tmp/cert_r4_w2/certification.json "$DEST/sweep_w2_n4096.json"
cp -f /tmp/cert_r4_w2/certification.md "$DEST/sweep_w2_n4096.md"
cp -f /tmp/cert_r4_w2_val/certification.json "$DEST/validation_w2_calibrated.json"
cp -f /tmp/cert_r4_w2_val/certification.md "$DEST/validation_w2_calibrated.md"
cp -f /tmp/cert_r4_w2_val/certification.indep.json "$DEST/validation_w2_calibrated.indep.json"
cp -f /tmp/cert_r4_w0/certification.json "$DEST/sweep_w0_n4096.json"
cp -f /tmp/cert_r4_w0/certification.md "$DEST/sweep_w0_n4096.md"
cp -f /tmp/cert_r4_w0_val/certification.json "$DEST/validation_w0_calibrated.json"
cp -f /tmp/cert_r4_w0_val/certification.md "$DEST/validation_w0_calibrated.md"
cp -f /tmp/cert_r4_w0_val/certification.indep.json "$DEST/validation_w0_calibrated.indep.json"
cp -f "$CAL"/calib_w*.npz "$DEST/"
# Drop stale committed calibs for step counts no longer in the sweep grid.
for f in "$DEST"/calib_w*.npz; do
  base=$(basename "$f")
  [ -f "$CAL/$base" ] || { echo "removing stale $base"; rm -f "$f"; }
done

echo "=== binwise falsification on the fresh artifacts ==="
python scripts/binwise_recalibration.py artifacts/certification

echo "=== round-4 certification rebuild complete ==="
python - <<'EOF'
import json
for name in ("validation_w2_calibrated.indep", "validation_w0_calibrated.indep"):
    d = json.load(open(f"artifacts/certification/{name}.json"))
    print(f"\n=== {name} (indep floor {d['noise_floor_max_pct_indep']}% max, "
          f"tol {d['certify_tolerance_pct_indep']}%) ===")
    for r in d["rows"]:
        print(f"  {r['config']}: {r['maps_per_min']} maps/min, "
              f"max {r['max_err_vs_indep_pct']}%, "
              f"pdfTV {r.get('pdf_tv_vs_indep')}, "
              f"dBPD {r.get('bpd_delta_vs_indep')}")
    print("  certified:", d.get("certified_configs_independent"))
    print("  full battery:", d.get("certified_full_battery_independent"))
EOF
