#!/bin/bash
# Mirror the in-flight N=16384 confirmation working dirs into the repo's
# archive every 10 minutes, so a mid-phase session end (followed by the
# between-rounds /tmp wipe) loses at most the config currently sampling.
# Run alongside scripts/resume_n16k_r4.sh / run_n16k_confirmation.sh:
#   bash scripts/n16k_watchdog.sh &
# Completed per-config spectra land under artifacts/certification/n16k/
# w{0,2}/inflight/; scripts/resume_n16k_r4.sh restores from either the
# final archive layout or these mirrors (val_* prefixes stripped back into
# the validation pk_cache).  JSON mirrors are written via a temp file + mv
# so a snapshot taken mid-write never clobbers the previous good mirror.
set -u
cd "$(dirname "$0")/.."
ARC=artifacts/certification/n16k

# mirror_json <src> <dst> — atomic, validated copy of a possibly-mid-write
# JSON file; keeps the previous mirror on parse failure.
mirror_json() {
  local src="$1" dst="$2" tmp
  [ -f "$src" ] || return 0
  tmp="${dst}.tmp.$$"
  cp -f "$src" "$tmp" 2>/dev/null || { rm -f "$tmp"; return 0; }
  if python -c "import json,sys; json.load(open(sys.argv[1]))" "$tmp" \
       2>/dev/null; then
    mv -f "$tmp" "$dst"
  else
    rm -f "$tmp"
  fi
}

while true; do
  for w in 2 0; do
    OUT=/tmp/cert_r4_w${w}_n16k
    [ -d "$OUT" ] || continue
    # Once a stage's final scoring is archived, its mirrors are deleted by
    # the resume driver — don't recreate them (committed inflight
    # duplicates were a round-4 review finding).
    [ -f "$ARC/w${w}/n16k_final.json" ] && continue
    DST="$ARC/w${w}/inflight"
    mkdir -p "$DST"
    cp -f "$OUT"/pk_cache/*.npz "$DST/" 2>/dev/null
    mirror_json "$OUT/certification.json" "$DST/refs_certification.json"
    cp -f "$OUT"/calib_refit_w${w}_*_n16k.npz "$DST/" 2>/dev/null
    mirror_json "$OUT/n16k_final.json" "$DST/n16k_final.json"
    if [ -d "${OUT}_val/pk_cache" ]; then
      for f in "${OUT}_val"/pk_cache/*.npz; do
        [ -e "$f" ] && cp -f "$f" "$DST/val_$(basename "$f")"
      done
      mirror_json "${OUT}_val/certification.json" \
        "$DST/val_certification.json"
      mirror_json "${OUT}_val/certification.indep.json" \
        "$DST/val_certification.indep.json"
    fi
  done
  sleep 600
done
