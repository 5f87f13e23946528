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
# alone.  See run_n16k_confirmation.sh for the protocol description and
# score_n16k_final.py for the PRE-REGISTERED decision rule.
#
# Restores fall back to the watchdog's w{0,2}/inflight/ crash-recovery
# mirrors (scripts/n16k_watchdog.sh) when a file is missing from the final
# archive layout, including val_-prefixed validation spectra (restored into
# ${OUT}_val/pk_cache/ with the prefix stripped), so a mid-validation or
# mid-w0 wipe resumes instead of rerunning hours of chip time.  Each stage
# is skipped when its n16k_final.json is already archived; inflight mirrors
# are deleted once the final archive exists.
#
# ~1.5 h chip time for the w=2 remainder; ~4 h for w=0 from scratch.
set -uo pipefail
cd "$(dirname "$0")/.."

ARC=artifacts/certification/n16k
MODEL=artifacts/certification/model/train_state.msgpack
VAL_N=${N16K_VAL_N:-65536}
[ -f "$MODEL" ] || { echo "missing checkpoint: $MODEL"; exit 1; }

# restore_file <w> <archive-name> <dest> [optional]
# Copies $ARC/w<w>/<archive-name>, falling back to the inflight mirror.
restore_file() {
  local w="$1" name="$2" dest="$3" opt="${4:-}"
  for src in "$ARC/w${w}/$name" "$ARC/w${w}/inflight/$name"; do
    if [ -f "$src" ]; then cp -f "$src" "$dest"; return 0; fi
  done
  [ -n "$opt" ] && return 0
  echo "restore failed: $ARC/w${w}/{,inflight/}$name not found" >&2
  exit 1
}

# restore_val_cache <w> <val-pk_cache-dir>
# Restores every mirrored val_*.npz (final archive or inflight), stripping
# the val_ prefix the watchdog adds, so certify_fast_sampler's pk_cache
# resume skips already-sampled validation configs.
restore_val_cache() {
  local w="$1" dst="$2" f base
  mkdir -p "$dst"
  for dir in "$ARC/w${w}" "$ARC/w${w}/inflight"; do
    for f in "$dir"/val_*.npz; do
      [ -e "$f" ] || continue
      base=$(basename "$f"); base=${base#val_}
      [ -f "$dst/$base" ] || cp -f "$f" "$dst/$base"
    done
  done
}

# Steps must match run_n16k_confirmation.sh's N16K_STEPS contract so the
# refit filename and the sampled config stay paired.
W2_STEPS=${N16K_STEPS:-500}

if [ -f "$ARC/w2/n16k_final.json" ]; then
  echo "=== w=2: n16k_final.json already archived — skipping ==="
else
  echo "=== w=2: restore committed phases 1-2 (steps=$W2_STEPS) ==="
  OUT=/tmp/cert_r4_w2_n16k
  mkdir -p "$OUT/pk_cache" "${OUT}_val"
  cp -f "$MODEL" "$OUT/train_state.msgpack"
  cp -f "$MODEL" "${OUT}_val/train_state.msgpack"
  restore_file 2 refs_certification.json "$OUT/certification.json"
  for f in DDPM_1500_seed_A DDPM_1500_seed_B DDPM_1500_seed_C \
           "strided_DDPM_${W2_STEPS}___spectral_calibration"; do
    restore_file 2 "$f.npz" "$OUT/pk_cache/$f.npz"
  done
  REFIT_NAME="calib_refit_w2_${W2_STEPS}_n16k.npz"
  restore_file 2 "$REFIT_NAME" "$OUT/$REFIT_NAME"
  REFIT="$OUT/$REFIT_NAME"
  restore_val_cache 2 "${OUT}_val/pk_cache"

  echo "=== w=2 phase 3/4: fresh-seed validation at N=$VAL_N ==="
  python scripts/certify_fast_sampler.py "${OUT}_val" 300 --skip-train \
    --guide-w 2 --eval-maps "$VAL_N" --timesteps 1500 \
    --families strided --ddim-steps --hybrid --dpm-steps --param-sets 1000 \
    --ref-from "$OUT/certification.json" --ref-eval-ok \
    --calibrated "$W2_STEPS:$REFIT" --cal-seed-base 6100000 \
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
  rm -rf "$ARC/w2/inflight"
  echo "w=2 confirmation archived: $ARC/w2/n16k_final.json"
fi

if [ -f "$ARC/w0/n16k_final.json" ]; then
  echo "=== w=0: n16k_final.json already archived — skipping ==="
else
  echo "=== w=0: restore any mirrored progress ==="
  W0=/tmp/cert_r4_w0_n16k
  mkdir -p "$W0/pk_cache" "${W0}_val/pk_cache"
  for dir in "$ARC/w0" "$ARC/w0/inflight"; do
    for f in "$dir"/*.npz; do
      [ -e "$f" ] || continue
      base=$(basename "$f")
      case "$base" in
        val_*) ;;  # handled by restore_val_cache
        calib_refit_*) [ -f "$W0/$base" ] || cp -f "$f" "$W0/$base" ;;
        *) [ -f "$W0/pk_cache/$base" ] || cp -f "$f" "$W0/pk_cache/$base" ;;
      esac
    done
  done
  restore_file 0 refs_certification.json "$W0/certification.json" optional
  restore_val_cache 0 "${W0}_val/pk_cache"

  echo "=== w=0: full four-phase chain ==="
  N16K_GUIDE_W=0 N16K_VAL_N="$VAL_N" bash scripts/run_n16k_confirmation.sh \
    || { echo "w=0 chain failed"; exit 1; }

  echo "=== w=0: archive ==="
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
  rm -rf "$ARC/w0/inflight"
fi
echo "=== N=16384 confirmation complete for both guidance settings ==="
