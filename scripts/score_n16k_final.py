#!/usr/bin/env python
"""Final scoring of the N=16384 serving-row confirmation (round-4 protocol).

Protocol (SPEEDUP.md "N=16384 confirmation"): the refit calibration
(scripts/fit_binwise_residual.py) consumes the seed-A exact-chain reference,
so the validation run may only be scored against references that never
entered any fit.  Two such references exist — the seed-B noise-floor run and
the seed-C run (certify_fast_sampler --extra-floor-seed) — and the primary
score is taken against their MEAN, which halves the reference noise variance
(per-bin sigma_ref = sigma_single / sqrt(2)); each single-seed score is also
reported.  The validation row itself is generated at a larger N
(--ref-eval-ok), shrinking its own noise further.

Gates (all three must hold for "certified", mirroring
certify_fast_sampler.py but with the LITERAL 1% tolerance — no floor
relaxation — because N=16384 references finally resolve it):
  * throughput >= 500 maps/min/chip;
  * max |P(k) ratio - 1| vs mean(B, C) <= 1.0%;
  * full battery: pixel-PDF TV <= max(0.01, TV(B, C)) and |BPD delta vs
    mean| <= max(1% |BPD|, |BPD_B - BPD_C|).

PRE-REGISTERED DECISION RULE (committed before any n16k_final.json exists;
commit order is the proof).  The mean(B,C) + large-N design still passes a
PERFECT sampler only ~80% of the time at the literal 1.0% gate (Monte-Carlo
of the measured noise model), so the miss-handling rule is fixed in advance
to forbid seed-shopping:

  * ``within_1pct_literal`` reports the raw literal outcome as-is:
    max-bin |P(k) ratio - 1| vs mean(B, C) <= 1.0% AND throughput >= 500
    maps/min/chip.  It may honestly be false.
  * ``confirmed_preregistered`` is the committed certification decision:
    throughput >= 500 maps/min/chip AND (literal pass OR
    ``zero_bias_p_value`` >= 0.05), where the p-value is the CONSERVATIVE
    one (fit-transfer noise omitted — biased against certification).  I.e.
    a literal miss still confirms iff a perfect sampler would show a
    max-bin deviation at least as large >= 5% of the time under the
    measured noise model.
  * NO post-hoc reruns, refits, or new validation seeds: the first
    completed phase-3/phase-4 execution per guidance setting is final and
    is the artifact that gets archived.  A miss under this rule is
    reported as a miss.

Also reported, fit-independent: the three pairwise reference distances
(A-B, A-C, B-C) — realizations of the estimator noise floor — and TWO
zero-bias consistency p-values bracketing the truth: the probability that a
PERFECT sampler's validation run would show a max-bin deviation at least as
large as observed, under the measured noise model (Gaussian mode-counting
noise times the non-Gaussian inflation profile of
fit_binwise_residual.inflation_profile).  The first omits fit-transfer
noise entirely (biases the p-value DOWN — against certification); the
second adds one full reference realization of transferred seed-A noise
(lambda=1 upper bound — biases it UP).  Supplementary reporting: the
argmax bin's identity/mode count and the max restricted to >=8-mode bins,
so a certification miss driven by a 5-mode Nyquist-corner bin is
self-diagnosing from the artifact alone.

Usage:
  python scripts/score_n16k_final.py refs.json validation.json -o final.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _pk(row):
    return np.asarray(row["pk"], np.float64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("refs_json",
                    help="certification.json carrying seed A/B/C rows")
    ap.add_argument("val_json",
                    help="certification.json carrying the validation row(s)")
    ap.add_argument("-o", "--out", required=True)
    args = ap.parse_args()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "fit_binwise_residual",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "fit_binwise_residual.py"),
    )
    fbr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fbr)

    from camels_diffusion_model_tpu.ops.spectrum import _linear_bin_info

    with open(args.refs_json) as f:
        refs = json.load(f)
    with open(args.val_json) as f:
        val = json.load(f)
    for field in ("guide_w", "timesteps", "scaling", "checkpoint_fingerprint"):
        assert refs[field] == val[field], (
            f"refs/val protocol mismatch: {field}"
        )

    k = np.asarray(refs["k_bins"], np.float64)
    pk_a = np.asarray(refs["pk_ddpm_ref"], np.float64)
    floor_rows = [r for r in refs["rows"]
                  if "independent seed" in r["config"]]
    b_rows = [r for r in floor_rows if not r["config"].endswith("seed C")]
    c_rows = [r for r in floor_rows if r["config"].endswith("seed C")]
    if not b_rows or not c_rows:
        raise SystemExit(
            "refs json must carry BOTH the independent-seed (B) and the "
            "independent seed C rows (certify_fast_sampler "
            "--extra-floor-seed)"
        )
    row_b, row_c = b_rows[0], c_rows[0]
    pk_b, pk_c = _pk(row_b), _pk(row_c)
    pk_bc = 0.5 * (pk_b + pk_c)
    good = (k > 0) & np.isfinite(pk_a) & (pk_a > 0)
    good &= np.isfinite(pk_b) & (pk_b > 0) & np.isfinite(pk_c) & (pk_c > 0)

    def err(p, q):
        r = p[good] / q[good]
        return (float(100 * np.max(np.abs(r - 1))),
                float(100 * np.mean(np.abs(r - 1))))

    n_ref = refs["n_eval_maps"]
    n_val = val["n_eval_maps"]
    floors = {
        "A_vs_B": err(pk_a, pk_b),
        "A_vs_C": err(pk_a, pk_c),
        "B_vs_C": err(pk_b, pk_c),
    }

    # noise model for the zero-bias p-value (see module docstring)
    _, counts, n_bins, k_bins = _linear_bin_info((64, 64), 1.0)
    counts = np.asarray(counts, np.float64)
    infl = fbr.inflation_profile(k_bins)
    gi = np.where(good)[0]
    sig_ref1 = infl[gi] / np.sqrt(counts[gi] * n_ref)   # one reference run
    sig_val = infl[gi] / np.sqrt(counts[gi] * n_val)    # the validation run
    sig_tot = np.sqrt(sig_val**2 + 0.5 * sig_ref1**2)   # vs mean(B, C)
    # Conservative bracket: the refit consumed seed A, so up to one full
    # reference realization of noise rides into the corrected row (lambda=1
    # bound at every bin; the true transfer is smaller — the smooth
    # Chebyshev averages A's noise over ~4x more bins than coefficients and
    # the binwise lambdas are < 1).  The two p-values bracket the truth.
    sig_tot_ft = np.sqrt(sig_tot**2 + sig_ref1**2)
    rng = np.random.default_rng(20260819)
    draws = rng.normal(0.0, 1.0, (200000, gi.size))
    mc_max = 100 * np.max(np.abs(draws * sig_tot), axis=1)
    mc_max_ft = 100 * np.max(np.abs(draws * sig_tot_ft), axis=1)

    delta = refs["pdf_bin_delta"]
    pdf_b = np.asarray(row_b["pdf"], np.float64)
    pdf_c = np.asarray(row_c["pdf"], np.float64)
    pdf_bc = 0.5 * (pdf_b + pdf_c)

    def tv(p, q):
        return float(0.5 * np.abs(np.asarray(p, np.float64) - q).sum()
                     * delta)

    pdf_floor = tv(pdf_b, pdf_c)
    bpd_b, bpd_c = row_b["bpd"], row_c["bpd"]
    bpd_bc = 0.5 * (bpd_b + bpd_c)
    bpd_floor = abs(bpd_b - bpd_c)
    pdf_tol = max(0.01, pdf_floor)
    bpd_tol = max(0.01 * abs(bpd_bc), bpd_floor)

    out_rows = []
    certified = []
    certified_full = []
    confirmed_prereg = []
    for r in val["rows"]:
        if r["steps"] == val["timesteps"]:
            continue  # quoted reference rows
        row = dict(r)
        pk_v = _pk(r)
        for name, ref_pk in (("A", pk_a), ("B", pk_b), ("C", pk_c),
                             ("meanBC", pk_bc)):
            mx, mn = err(pk_v, ref_pk)
            row[f"max_err_vs_{name}_pct"] = round(mx, 2)
            row[f"mean_err_vs_{name}_pct"] = round(mn, 2)
        obs = row["max_err_vs_meanBC_pct"]
        # per-bin detail of the authoritative comparison, so a max driven
        # by a few-mode corner bin is self-explanatory in the artifact
        rel = 100 * (pk_v[good] / pk_bc[good] - 1)
        imax = int(np.argmax(np.abs(rel)))
        row["argmax_bin"] = {
            "bin": int(gi[imax]),
            "k": round(float(k[gi[imax]]), 4),
            "modes": int(counts[gi[imax]]),
            "signed_err_pct": round(float(rel[imax]), 3),
        }
        ge8 = counts[gi] >= 8
        row["max_err_vs_meanBC_ge8modes_pct"] = round(
            float(np.max(np.abs(rel[ge8]))), 2
        )
        row["zero_bias_p_value"] = round(float((mc_max >= obs).mean()), 4)
        row["zero_bias_p_value_fit_transfer"] = round(
            float((mc_max_ft >= obs).mean()), 4
        )
        row["noise_model_median_max_pct"] = round(
            float(np.median(mc_max)), 2
        )
        row["noise_model_ft_median_max_pct"] = round(
            float(np.median(mc_max_ft)), 2
        )
        if "pdf" in r:
            row["pdf_tv_vs_meanBC"] = round(tv(r["pdf"], pdf_bc), 7)
        if "bpd" in r:
            row["bpd_delta_vs_meanBC"] = float(r["bpd"] - bpd_bc)
        spectral_ok = obs <= 1.0
        tp_ok = (r["maps_per_min"] is not None
                 and r["maps_per_min"] >= 500)
        battery_ok = (
            row.get("pdf_tv_vs_meanBC") is not None
            and row["pdf_tv_vs_meanBC"] <= pdf_tol
            and row.get("bpd_delta_vs_meanBC") is not None
            and abs(row["bpd_delta_vs_meanBC"]) <= bpd_tol
        )
        row["certified_literal_1pct"] = bool(spectral_ok and tp_ok)
        row["certified_full_battery"] = bool(
            spectral_ok and tp_ok and battery_ok
        )
        # Pre-registered decision (module docstring): a literal miss still
        # confirms iff the conservative zero-bias p-value >= 0.05.
        row["confirmed_preregistered"] = bool(
            tp_ok and (spectral_ok or row["zero_bias_p_value"] >= 0.05)
        )
        if row["certified_literal_1pct"]:
            certified.append(r["config"])
        if row["certified_full_battery"]:
            certified_full.append(r["config"])
        if row["confirmed_preregistered"]:
            confirmed_prereg.append(r["config"])
        out_rows.append(row)

    result = {
        "protocol": (
            "N=16384 three-reference confirmation: refit calibration fitted "
            "on seed A only; validation generated with fresh seeds at "
            f"N={n_val} and scored against mean(seed B, seed C) at "
            f"N={n_ref} each; literal 1% tolerance (no floor relaxation)"
        ),
        "checkpoint_fingerprint": refs["checkpoint_fingerprint"],
        "guide_w": refs["guide_w"],
        "n_eval_refs": n_ref,
        "n_eval_validation": n_val,
        "reference_pair_distances_max_mean_pct": {
            name: [round(v, 2) for v in pair]
            for name, pair in floors.items()
        },
        "pdf_floor_tv_BC": round(pdf_floor, 7),
        "bpd_floor_abs_BC": float(bpd_floor),
        "pdf_tolerance": round(pdf_tol, 7),
        "bpd_tolerance": float(bpd_tol),
        "noise_model": (
            "sigma_bin = inflation(k)/sqrt(modes*N); inflation pooled from "
            "every committed independent exact-chain realization "
            "(scripts/measure_noise_inflation.py -> "
            "fit_binwise_residual.inflation_profile); zero_bias_p_value "
            "omits fit-transfer noise (conservative), "
            "zero_bias_p_value_fit_transfer adds a lambda=1 bound of one "
            "transferred seed-A realization (anti-conservative) - the two "
            "bracket a perfect sampler's probability of the observed max"
        ),
        "preregistered_rule": (
            "confirmed iff throughput >= 500 maps/min/chip AND (max-bin vs "
            "mean(B,C) <= 1.0% OR conservative zero_bias_p_value >= 0.05); "
            "no post-hoc reruns/refits/seeds — first completed scoring per "
            "guidance setting is final (rule committed before any "
            "n16k_final.json existed)"
        ),
        "rows": out_rows,
        "certified_literal_1pct": certified,
        "certified_full_battery": certified_full,
        "confirmed_preregistered": confirmed_prereg,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)

    print("reference pair distances (max% / mean%):")
    for name, (mx, mn) in floors.items():
        print(f"  {name}: {mx:.2f} / {mn:.2f}")
    print(f"battery floors (B vs C): pdf TV {pdf_floor:.5f}, "
          f"|dBPD| {bpd_floor:.2e}")
    for row in out_rows:
        print(f"\n{row['config']}  ({row['maps_per_min']} maps/min, "
              f"N={n_val}):")
        print(f"  max|P(k) ratio-1|: vs mean(B,C) "
              f"{row['max_err_vs_meanBC_pct']}%  "
              f"(vs A {row['max_err_vs_A_pct']}%, "
              f"B {row['max_err_vs_B_pct']}%, "
              f"C {row['max_err_vs_C_pct']}%)")
        am = row["argmax_bin"]
        print(f"  argmax bin {am['bin']} (k={am['k']}, {am['modes']} modes): "
              f"{am['signed_err_pct']:+.3f}%; max over >=8-mode bins "
              f"{row['max_err_vs_meanBC_ge8modes_pct']}%")
        print(f"  zero-bias p-value {row['zero_bias_p_value']} "
              f"(median max {row['noise_model_median_max_pct']}%); "
              f"with fit-transfer bound "
              f"{row['zero_bias_p_value_fit_transfer']} "
              f"(median {row['noise_model_ft_median_max_pct']}%)")
        print(f"  pdf TV vs mean(B,C) {row.get('pdf_tv_vs_meanBC')} "
              f"(tol {pdf_tol:.5f}); dBPD "
              f"{row.get('bpd_delta_vs_meanBC'):+.2e} (tol {bpd_tol:.2e})")
        print(f"  certified (literal <=1.0% + >=500 maps/min): "
              f"{row['certified_literal_1pct']}; full battery: "
              f"{row['certified_full_battery']}; pre-registered decision "
              f"(literal OR p>=0.05): {row['confirmed_preregistered']}")
    print(f"\nwritten: {args.out}")


if __name__ == "__main__":
    main()
