#!/bin/bash
# Resume the round-4 N=16384 confirmation after a /tmp wipe.
#
# The w=2 phases 1-2 products (three exact references, base-calibrated row,
# high-statistics refit) are committed under artifacts/certification/n16k/w2;
# this script restores them into the protocol's working directories, runs the
# outstanding w=2 phases 3-4 (fresh-seed N=65536 validation + three-reference
# scoring at the LITERAL 1% tolerance), then runs the full w=0 chain via
# scripts/run_n16k_confirmation.sh, archiving every product back into
# artifacts/certification/n16k/ so the confirmation reproduces from the repo
# alone.  See run_n16k_confirmation.sh for the protocol description.
#
# ~1.5 h chip time for the w=2 remainder; ~4 h for w=0 from scratch.
set -uo pipefail
cd "$(dirname "$0")/.."

ARC=artifacts/certification/n16k
MODEL=artifacts/certification/model/train_state.msgpack
VAL_N=${N16K_VAL_N:-65536}

echo "=== w=2: restore committed phases 1-2 ==="
OUT=/tmp/cert_r4_w2_n16k
mkdir -p "$OUT/pk_cache" "${OUT}_val"
cp -f "$MODEL" "$OUT/train_state.msgpack"
cp -f "$MODEL" "${OUT}_val/train_state.msgpack"
cp -f "$ARC/w2/refs_certification.json" "$OUT/certification.json"
for f in DDPM_1500_seed_A DDPM_1500_seed_B DDPM_1500_seed_C \
         strided_DDPM_500___spectral_calibration; do
  cp -f "$ARC/w2/$f.npz" "$OUT/pk_cache/$f.npz"
done
REFIT="$ARC/w2/calib_refit_w2_500_n16k.npz"

echo "=== w=2 phase 3/4: fresh-seed validation at N=$VAL_N ==="
python scripts/certify_fast_sampler.py "${OUT}_val" 300 --skip-train \
  --guide-w 2 --eval-maps "$VAL_N" --timesteps 1500 \
  --families strided --ddim-steps --hybrid --dpm-steps --param-sets 1000 \
  --ref-from "$OUT/certification.json" --ref-eval-ok \
  --calibrated "500:$REFIT" --cal-seed-base 6100000 \
  || { echo "w=2 phase 3 failed"; exit 1; }

echo "=== w=2 phase 4/4: three-reference scoring (literal 1% tolerance) ==="
python scripts/score_n16k_final.py \
  "$OUT/certification.json" "${OUT}_val/certification.json" \
  -o "$OUT/n16k_final.json" \
  || { echo "w=2 phase 4 failed"; exit 1; }
python scripts/rescore_validation.py \
  "$OUT/certification.json" "${OUT}_val/certification.json" \
  -o "${OUT}_val/certification.indep.json" || true

echo "=== w=2: archive ==="
cp -f "$OUT/n16k_final.json" "$ARC/w2/n16k_final.json"
cp -f "${OUT}_val/certification.json" "$ARC/w2/val_certification.json"
cp -f "${OUT}_val/certification.indep.json" \
      "$ARC/w2/val_certification.indep.json" 2>/dev/null || true
for f in "${OUT}_val"/pk_cache/*.npz; do
  cp -f "$f" "$ARC/w2/val_$(basename "$f")"
done
echo "w=2 confirmation archived: $ARC/w2/n16k_final.json"

echo "=== w=0: full four-phase chain ==="
N16K_GUIDE_W=0 N16K_VAL_N="$VAL_N" bash scripts/run_n16k_confirmation.sh \
  || { echo "w=0 chain failed"; exit 1; }

echo "=== w=0: archive ==="
W0=/tmp/cert_r4_w0_n16k
mkdir -p "$ARC/w0"
cp -f "$W0/certification.json" "$ARC/w0/refs_certification.json"
cp -f "$W0/n16k_final.json" "$ARC/w0/n16k_final.json"
cp -f "$W0"/calib_refit_w0_*_n16k.npz "$ARC/w0/" 2>/dev/null || true
for f in "$W0"/pk_cache/*.npz; do cp -f "$f" "$ARC/w0/"; done
cp -f "${W0}_val/certification.json" "$ARC/w0/val_certification.json"
cp -f "${W0}_val/certification.indep.json" \
      "$ARC/w0/val_certification.indep.json" 2>/dev/null || true
for f in "${W0}_val"/pk_cache/*.npz; do
  cp -f "$f" "$ARC/w0/val_$(basename "$f")"
done
echo "=== N=16384 confirmation complete for both guidance settings ==="
