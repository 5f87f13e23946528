#!/bin/bash
# Mirror the in-flight N=16384 confirmation working dirs into the repo's
# archive every 10 minutes, so a mid-phase session end (followed by the
# between-rounds /tmp wipe) loses at most the config currently sampling.
# Run alongside scripts/resume_n16k_r4.sh / run_n16k_confirmation.sh:
#   bash scripts/n16k_watchdog.sh &
# Completed per-config spectra land under artifacts/certification/n16k/
# w{0,2}/inflight/; the resume driver knows how to restore from either the
# final archive layout or these mirrors (same filenames).
set -u
cd "$(dirname "$0")/.."
ARC=artifacts/certification/n16k
while true; do
  for w in 2 0; do
    OUT=/tmp/cert_r4_w${w}_n16k
    [ -d "$OUT" ] || continue
    DST="$ARC/w${w}/inflight"
    mkdir -p "$DST"
    cp -f "$OUT"/pk_cache/*.npz "$DST/" 2>/dev/null
    cp -f "$OUT/certification.json" "$DST/refs_certification.json" \
      2>/dev/null
    cp -f "$OUT"/calib_refit_w${w}_*_n16k.npz "$DST/" 2>/dev/null
    cp -f "$OUT/n16k_final.json" "$DST/" 2>/dev/null
    if [ -d "${OUT}_val/pk_cache" ]; then
      for f in "${OUT}_val"/pk_cache/*.npz; do
        [ -e "$f" ] && cp -f "$f" "$DST/val_$(basename "$f")"
      done
      cp -f "${OUT}_val/certification.json" "$DST/val_certification.json" \
        2>/dev/null
      cp -f "${OUT}_val/certification.indep.json" \
        "$DST/val_certification.indep.json" 2>/dev/null
    fi
  done
  sleep 600
done
