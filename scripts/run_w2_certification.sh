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
#          the committed w=0 round, artifacts/certification/).
#
# Usage: scripts/run_w2_certification.sh   (~2.5 h on one v5e chip)
# Env overrides (CPU smoke: W2_SWEEP=/tmp/w2smoke W2_VAL=/tmp/w2smoke_val
#   W2_EVAL_MAPS=8 W2_TIMESTEPS=30 W2_STEPS="10 20"
#   W2_EXTRA="--param-sets 4 --bench-batch 4"):
set -uo pipefail
cd "$(dirname "$0")/.."
SWEEP=${W2_SWEEP:-/tmp/cert_r3_w2}
VAL=${W2_VAL:-/tmp/cert_r3_w2_val}
EVAL_MAPS=${W2_EVAL_MAPS:-4096}
T=${W2_TIMESTEPS:-1500}
EPOCHS=${W2_EPOCHS:-300}
# Guidance strength (W2_GUIDE=0 reuses this pipeline for the w=0 chain; the
# calib sidecars are named calib_w$GUIDE_$steps.npz either way).
GUIDE=${W2_GUIDE:-2}
# Reference scale by default (13,500 train / 1,500 test — the committed
# w=0 round's protocol, artifacts/certification/train_300epoch.log).
EXTRA=${W2_EXTRA:---param-sets 1000}
CALIB=${W2_CALIB_DIR:-/tmp}
STEPS=${W2_STEPS:-"440 500 560 620 680 750 900"}  # 750/900 map the valley
                                      # floor even under 500 maps/min

# Freshness stamp: every stage's output json must be NEWER than this, so a
# crashed stage can never hand a stale artifact from a previous run to the
# next stage (the old gate only tested existence).
STAMP=$(mktemp /tmp/w2cert_stamp.XXXXXX)

# Stage A trains the reference-scale checkpoint if $SWEEP doesn't already
# hold one (resumable: checkpoints every 10 epochs), then sweeps.
python scripts/certify_fast_sampler.py "$SWEEP" "$EPOCHS" \
  --guide-w "$GUIDE" --eval-maps "$EVAL_MAPS" --timesteps "$T" \
  --families strided \
  --ddim-steps $STEPS --hybrid --dpm-steps $EXTRA \
  2>&1 | tee /tmp/cert_w2_stageA.log
rc=$?
[ "$rc" -eq 0 ] || { echo "stage A failed (rc=$rc)"; exit 1; }
[ "$SWEEP/certification.json" -nt "$STAMP" ] || {
  echo "stage A left no fresh certification.json"; exit 1; }

SPECS=""
for s in $STEPS; do
  python scripts/fit_calibration.py "$SWEEP/certification.json" \
    "strided DDPM $s" -o "$CALIB/calib_w${GUIDE}_$s.npz" \
    2>&1 | tee -a /tmp/cert_w2_fits.log
  rc=$?
  [ "$rc" -eq 0 ] || { echo "calibration fit for $s failed (rc=$rc)"; exit 1; }
  SPECS="$SPECS $s:$CALIB/calib_w${GUIDE}_$s.npz"
done

# Stage B shares stage A's checkpoint (certify looks it up in its outdir;
# a missing checkpoint under --skip-train is a hard error, never random
# weights).
mkdir -p "$VAL"
cp -f "$SWEEP/train_state.msgpack" "$VAL/train_state.msgpack"
python scripts/certify_fast_sampler.py "$VAL" "$EPOCHS" --skip-train \
  --guide-w "$GUIDE" --eval-maps "$EVAL_MAPS" --timesteps "$T" \
  --families strided \
  --ddim-steps --hybrid --dpm-steps $EXTRA \
  --ref-from "$SWEEP/certification.json" --calibrated $SPECS \
  2>&1 | tee /tmp/cert_w2_stageB.log
rc=$?
[ "$rc" -eq 0 ] || { echo "stage B failed (rc=$rc)"; exit 1; }
[ "$VAL/certification.json" -nt "$STAMP" ] || {
  echo "stage B left no fresh certification.json"; exit 1; }
rm -f "$STAMP"

echo "=== w=2 certification pipeline complete ==="
echo "stage A: $SWEEP/certification.{json,md}"
echo "stage B: $VAL/certification.{json,md}"
