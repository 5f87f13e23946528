#!/usr/bin/env python
"""EXACT counterfactual of an N=16384 confirmation under a corner-free
refit — a DIAGNOSTIC, not a certification.

The pre-registered result (artifacts/certification/n16k/w{0,2}/
n16k_final.json) is final: a miss at the 5-mode Nyquist-corner bin 45
(SPEEDUP.md diagnosis — at w=2 manufactured by the ungated refit's own
binwise correction there; at w=0 the gated refit carried only the smooth
fit's entry and the bin's own estimator draw still missed).  Because the spectral
calibration is a fixed radial power multiplier (diffusion/calibration.py:
P_out(k) = P_raw(k) / r(k)), the P(k) of the SAME fresh-seed validation
samples under any alternative filter r'(k) follows exactly, with no
re-sampling:

    P_alt(k) = P_val(k) * r_refit(k) / r_alt(k)

This script computes that counterfactual for r_alt = the committed refit
with every sub-8-mode table entry reset to 1 (only bin 45 qualifies on the
64x64 grid), re-scores it with the scorer's own gates and noise model, and
writes the result as a clearly-labeled diagnostic artifact.  It also saves
the corner-free calibration npz itself as the recommended FORWARD-LOOKING
serving filter (stamped, awaiting its own out-of-sample confirmation —
nothing here upgrades the pre-registered verdict).

Usage:
  python scripts/n16k_counterfactual_corner.py \
      artifacts/certification/n16k/w{0,2} artifacts/diagnostics_r5
"""

import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from camels_diffusion_model_tpu.diffusion.calibration import (
    SpectralCalibration,
    load_calibration_meta,
)
from camels_diffusion_model_tpu.ops.spectrum import _linear_bin_info

MIN_MODES = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("arc", help="archived w=2 n16k directory")
    ap.add_argument("out_dir", help="diagnostics output directory")
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "fit_binwise_residual",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "fit_binwise_residual.py"),
    )
    fbr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fbr)

    final = json.load(open(os.path.join(args.arc, "n16k_final.json")))
    refs = json.load(open(os.path.join(args.arc, "refs_certification.json")))
    row = final["rows"][0]
    steps = row["steps"]
    refit_path = os.path.join(
        args.arc, f"calib_refit_w{int(final['guide_w'])}_{steps}_n16k.npz"
    )
    val_pk_path = os.path.join(
        args.arc, f"val_strided_DDPM_{steps}___spectral_calibration.npz"
    )
    refit = SpectralCalibration.load(refit_path)
    meta = load_calibration_meta(refit_path)

    _, counts, n_bins, k_bins = _linear_bin_info((64, 64), 1.0)
    counts = np.asarray(counts, np.float64)
    few = [i for i, r in enumerate(refit.bin_ratios or [])
           if r != 1.0 and counts[i] < MIN_MODES]

    # Corner-free alternative: identical smooth part, sub-8-mode binwise
    # entries reset to 1 (on 64x64 only bin 45 qualifies).
    alt_ratios = list(refit.bin_ratios)
    for i in few:
        alt_ratios[i] = 1.0
    alt = SpectralCalibration(
        coeffs=refit.coeffs, k_min=refit.k_min, k_max=refit.k_max,
        dl=refit.dl, clip=refit.clip, bin_ratios=tuple(alt_ratios),
    )

    z = np.load(val_pk_path)
    k = np.asarray(z["k"], np.float64)
    pk_val = np.asarray(z["pk"], np.float64)
    r_refit = refit.total_ratio(k, 64)
    r_alt = alt.total_ratio(k, 64)
    pk_alt = pk_val * r_refit / r_alt

    pk_b = np.asarray(
        [r for r in refs["rows"]
         if "independent seed" in r["config"]
         and not r["config"].endswith("seed C")][0]["pk"], np.float64)
    pk_c = np.asarray(
        [r for r in refs["rows"]
         if r["config"].endswith("seed C")][0]["pk"], np.float64)
    pk_bc = 0.5 * (pk_b + pk_c)
    good = (k > 0) & np.isfinite(pk_bc) & (pk_bc > 0) & np.isfinite(pk_alt)

    rel = 100 * (pk_alt[good] / pk_bc[good] - 1)
    gi = np.where(good)[0]
    obs = float(np.max(np.abs(rel)))
    ge8 = counts[gi] >= MIN_MODES

    # Same noise model + MC as score_n16k_final.py.
    infl = fbr.inflation_profile(k_bins)
    n_ref, n_val = refs["n_eval_maps"], final["n_eval_validation"]
    sig_ref1 = infl[gi] / np.sqrt(counts[gi] * n_ref)
    sig_val = infl[gi] / np.sqrt(counts[gi] * n_val)
    sig_tot = np.sqrt(sig_val ** 2 + 0.5 * sig_ref1 ** 2)
    rng = np.random.default_rng(20260819)
    mc_max = 100 * np.max(
        np.abs(rng.normal(0.0, 1.0, (200000, gi.size)) * sig_tot), axis=1)

    out = {
        "WHAT_THIS_IS": (
            f"EXACT counterfactual diagnostic of the same fresh-seed "
            f"w={final['guide_w']:g} validation samples under the "
            "corner-free refit (sub-8-mode table entries reset to 1) — "
            "the spectral filter is a fixed deterministic radial power "
            "multiplier, so this is algebra, not a re-run.  It does NOT "
            "amend the pre-registered verdict in n16k_final.json (a "
            "miss); it isolates exactly what the corner entry "
            "contributed to it."
        ),
        "checkpoint_fingerprint": final["checkpoint_fingerprint"],
        "guide_w": final["guide_w"],
        "removed_table_entries": [
            {"bin": int(i), "modes": int(counts[i]),
             "ratio_removed": float(refit.bin_ratios[i])} for i in few
        ],
        "preregistered_result_max_pct": row["max_err_vs_meanBC_pct"],
        "counterfactual_max_err_vs_meanBC_pct": round(obs, 2),
        "counterfactual_max_err_ge8modes_pct": round(
            float(np.max(np.abs(rel[ge8]))), 2),
        "counterfactual_mean_err_pct": round(float(np.mean(np.abs(rel))), 2),
        "counterfactual_zero_bias_p_value": round(
            float((mc_max >= obs).mean()), 4),
        "counterfactual_would_pass_literal_1pct": bool(obs <= 1.0),
        "corner_bin_counterfactual_err_pct": (
            [round(float(100 * (pk_alt[i] / pk_bc[i] - 1)), 3) for i in few]
        ),
    }
    os.makedirs(args.out_dir, exist_ok=True)
    out_path = os.path.join(
        args.out_dir,
        f"n16k_w{int(final['guide_w'])}_corner_counterfactual.json",
    )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)

    # Forward-looking serving filter (stamped like every calibration).
    alt_path = os.path.join(
        args.arc, f"calib_refit_w{int(final['guide_w'])}_{steps}"
        "_n16k_nocorner.npz")
    alt.save(alt_path, meta={**meta, "derived_from": os.path.basename(
        refit_path), "note": "sub-8-mode binwise entries removed "
        "(measured to chase estimator noise — SPEEDUP.md); awaiting its "
        "own out-of-sample confirmation"})

    print(json.dumps(out, indent=1))
    print(f"\nwritten: {out_path}\nforward-looking filter: {alt_path}")


if __name__ == "__main__":
    main()
