#!/bin/bash
# w=2 (CFG-on) certification pipeline — the north star's stated setting
# (BASELINE.md:29-31; reference sampler semantics
# train_diffusion_paper.py:555-623 with guide_w=2).
#
# Stage A: strided-DDPM valley sweep at N=4096 on the reference-scale
#          300-epoch checkpoint (generates the w=2 exact-chain reference +
#          independent-seed noise-floor rows).  Resumable via pk_cache.
# Fits:    radial spectral-calibration fit per strided row (CPU).
# Stage B: OUT-OF-SAMPLE validation of the calibrated rows — fresh sampler
#          seeds, reference spectra reused via --ref-from (same protocol as
#          the committed w=0 round, artifacts/certification_r3/).
#
# Usage: scripts/run_w2_certification.sh   (~2.5 h on one v5e chip)
set -uo pipefail
cd "$(dirname "$0")/.."
SWEEP=/tmp/cert_r3_w2
VAL=/tmp/cert_r3_w2_val
STEPS="440 500 560 620 680 750 900"   # 750/900 map the valley floor even
                                      # though they sit under 500 maps/min

python scripts/certify_fast_sampler.py "$SWEEP" 300 --skip-train \
  --guide-w 2 --eval-maps 4096 --families strided \
  --ddim-steps $STEPS --hybrid --dpm-steps \
  2>&1 | tee /tmp/cert_w2_stageA.log
test -f "$SWEEP/certification.json" || { echo "stage A failed"; exit 1; }

SPECS=""
for s in $STEPS; do
  python scripts/fit_calibration.py "$SWEEP/certification.json" \
    "strided DDPM $s" -o "/tmp/calib_w2_$s.npz" \
    2>&1 | tee -a /tmp/cert_w2_fits.log
  SPECS="$SPECS $s:/tmp/calib_w2_$s.npz"
done

python scripts/certify_fast_sampler.py "$VAL" 300 --skip-train \
  --guide-w 2 --eval-maps 4096 --families strided \
  --ddim-steps --hybrid --dpm-steps \
  --ref-from "$SWEEP/certification.json" --calibrated $SPECS \
  2>&1 | tee /tmp/cert_w2_stageB.log

echo "=== w=2 certification pipeline complete ==="
echo "stage A: $SWEEP/certification.{json,md}"
echo "stage B: $VAL/certification.{json,md}"
