#!/bin/bash
# Calibrated DPM-Solver++(2M) experiment: can the fixed radial spectral
# calibration close the 2nd-order ODE sampler's P(k) offset at 50-200 model
# evals/map?  The ODE family converges to the DDIM eta=0 limit, whose gap vs
# the reference SDE chain is large but SMOOTH in |k| — exactly the residual
# class the calibration removes in expectation.  If a calibrated DPM row
# passes the FULL battery (spectrum + pixel-PDF + BPD, independent-seed
# scored), it becomes a ~5x faster certified serving row than the strided
# valley; if it fails the pixel-PDF/BPD clauses, that is the battery doing
# its job (a spectral filter cannot fix off-manifold maps).
#
# Run AFTER the w=2 chain (reuses its stage-A references via --ref-from and
# its checkpoint).  ~20 min on one v5e.
# Usage: scripts/run_dpm_calibration.sh
set -euo pipefail
cd "$(dirname "$0")/.."
SWEEP=${DPM_SWEEP:-/tmp/cert_r4_w2}   # stage-A outdir (refs + checkpoint)
OUT=${DPM_OUT:-/tmp/cert_r4_dpm}
VAL=${DPM_VAL:-/tmp/cert_r4_dpm_val}
CAL=${DPM_CALIB_DIR:-/tmp/cert_r4_calib}
STEPS=${DPM_STEPS:-"50 100 200"}
EXTRA=${DPM_EXTRA:---param-sets 1000}
EVAL_MAPS=${DPM_EVAL_MAPS:-4096}
T=${DPM_TIMESTEPS:-1500}
mkdir -p "$CAL"
for d in "$OUT" "$VAL"; do
  mkdir -p "$d"
  cp -f "$SWEEP/train_state.msgpack" "$d/train_state.msgpack"
done

echo "=== raw DPM rows (fit set) ==="
python scripts/certify_fast_sampler.py "$OUT" 300 --skip-train \
  --guide-w 2 --eval-maps "$EVAL_MAPS" --timesteps "$T" --families strided \
  --ddim-steps --hybrid --dpm-steps $STEPS $EXTRA \
  --ref-from "$SWEEP/certification.json" 2>&1 | tee /tmp/cert_dpm_raw.log

SPECS=""
for s in $STEPS; do
  python scripts/fit_calibration.py "$OUT/certification.json" \
    "DPM-Solver++(2M) $s" -o "$CAL/calib_dpm_w2_$s.npz"
  SPECS="$SPECS dpm:$s:$CAL/calib_dpm_w2_$s.npz"
done

echo "=== calibrated DPM rows (fresh seeds, out-of-sample) ==="
python scripts/certify_fast_sampler.py "$VAL" 300 --skip-train \
  --guide-w 2 --eval-maps "$EVAL_MAPS" --timesteps "$T" --families strided \
  --ddim-steps --hybrid --dpm-steps $EXTRA \
  --ref-from "$SWEEP/certification.json" --calibrated $SPECS \
  2>&1 | tee /tmp/cert_dpm_val.log

python scripts/rescore_validation.py "$SWEEP/certification.json" \
  "$VAL/certification.json" -o "$VAL/certification.indep.json"
echo "=== calibrated-DPM experiment complete: $VAL/certification.indep.json ==="
