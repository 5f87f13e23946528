"""Test a mode-count-gated BINWISE radial calibration against the w=2 residual.

SPEEDUP.md's w=2 section reports that the calibrated strided-500 row bottoms
out at 1.73% max-bin vs the 1.68% independent noise floor, with the residual
concentrated in alternating-sign deviations of adjacent high-k bins — i.e.
radial but NOT smooth, so no polynomial r(k) can express it.  A *binwise*
radial filter CAN express it: one multiplicative constant per linear P(k)
annulus (ops/spectrum.py:_linear_bin_info binning).  Because every Fourier
mode in a linear bin gets the same factor and the estimator is the unweighted
mean over exactly those modes, a binwise factor q_b scales the measured bin
power by exactly 1/q_b — which means the whole experiment can be run from the
committed certification artifacts alone, with full out-of-sample honesty:

  * FIT (stage A): per-bin residual q_b = (P_raw * poly_eff) / P_refA from
    the committed N=4096 sweep (the calibration seed), where poly_eff_b is
    the exact mode-average of the existing polynomial filter over bin b
    (pure geometry).  Bins with fewer than ``gate`` modes keep q_b = 1 — the
    stage-A ratio noise sqrt(4/(M*N)) makes sparse-bin fits meaningless.
  * VALIDATE (stage B): divide the committed fresh-seed calibrated spectra
    by q_b and score against the INDEPENDENT seed-B exact chain — the same
    authoritative protocol as scripts/rescore_validation.py.  Stage B's
    seeds were never seen by the fit, so the scoring cannot be gamed.

Measured verdict (artifacts/certification/binwise_w2.json, round-4
artifacts): binwise does not beat the best smooth-radial row — it makes the
certified 500-step row WORSE (1.61% -> 1.95%) and its one improvement (560
steps, 1.89% -> 1.66% at the 16-mode gate) stays above the plain 500-step
row on both error and throughput.  The A->B residual correlations are only
0.14-0.45, i.e. half or more of the stage-A residual is estimator noise,
which the binwise division injects into stage B.  (Round 3's artifacts, now
in git history, gave the strictly-negative form of the same verdict:
1.73% -> 1.81% at 500 steps with nothing improved.)  This is the evidence
behind SPEEDUP.md's claim that the residual over the floor is the
comparison's own Monte-Carlo noise (concentrated in the 5-16-mode
Nyquist-corner bins), not a removable bias.

Usage: python scripts/binwise_recalibration.py [artifacts_dir] [out.json]
Pure numpy / committed-artifact analysis — no TPU, no model checkpoint.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from camels_diffusion_model_tpu.diffusion.calibration import SpectralCalibration

GATES = (16, 48)
STEPS = (500, 560, 620)


def linear_bin_geometry(n: int = 64, dl: float = 1.0):
    """Per-mode |k| + bin assignment of ops/spectrum.py's linear binning.

    Bin indices/counts come straight from the estimator's own
    ``_linear_bin_info`` so the geometry cannot drift; only the per-mode
    |k| grid (which the estimator never exposes) is computed here."""
    from camels_diffusion_model_tpu.ops.spectrum import _linear_bin_info

    bin_idx_j, counts, n_bins, _ = _linear_bin_info((n, n), dl)
    bin_idx = np.asarray(bin_idx_j)  # overflow bucket == n_bins
    valid = bin_idx < n_bins
    comps = [2 * np.pi * np.fft.fftfreq(n, dl)] * 2
    gy, gx = np.meshgrid(*comps, indexing="ij")
    kgrid = np.sqrt(gy**2 + gx**2).ravel()
    return kgrid, bin_idx, valid, counts, n_bins


def poly_eff_per_bin(calib: SpectralCalibration, kgrid, bin_idx, valid, counts, n_bins):
    """Exact mode-average of the polynomial filter's power factor per bin.

    The map-space filter multiplies mode power by 1/r_poly(|k|); the linear
    estimator averages uniformly over the modes of each bin, so the bin's
    power scales by the uniform mode-average of 1/r_poly — computable from
    geometry alone (no per-mode data needed).
    """
    rinv = 1.0 / calib.ratio(kgrid)
    sums = np.bincount(bin_idx[valid], weights=rinv[valid], minlength=n_bins)[:n_bins]
    return np.where(counts > 0, sums / np.maximum(counts, 1), 1.0)


def main():
    art = sys.argv[1] if len(sys.argv) > 1 else "artifacts/certification"
    out_path = sys.argv[2] if len(sys.argv) > 2 else f"{art}/binwise_w2.json"
    sweep = json.load(open(f"{art}/sweep_w2_n4096.json"))
    val = json.load(open(f"{art}/validation_w2_calibrated.indep.json"))

    k = np.array(sweep["k_bins"])
    ref_a = np.array(sweep["pk_ddpm_ref"])
    ref_b = np.array(
        next(r["pk"] for r in sweep["rows"] if r["config"] == "DDPM 1500, independent seed")
    )
    kgrid, bin_idx, valid, counts, n_bins = linear_bin_geometry()
    assert n_bins == len(k), (n_bins, len(k))
    good = (k > 0) & (ref_a > 0) & (ref_b > 0) & (counts > 0)

    results = {"protocol": __doc__.split("\n")[0], "n_eval_maps": sweep["n_eval_maps"],
               "noise_floor_max_pct_indep": val["noise_floor_max_pct_indep"], "rows": []}
    for steps in STEPS:
        calib = SpectralCalibration.load(f"{art}/calib_w2_{steps}.npz")
        poly_eff = poly_eff_per_bin(calib, kgrid, bin_idx, valid, counts, n_bins)
        raw = np.array(
            next(r["pk"] for r in sweep["rows"]
                 if r.get("steps") == steps and r["config"].startswith("strided"))
        )
        # Stage-A residual ratio after the polynomial (what a binwise filter
        # would be fitted to): q_b = P_raw * poly_eff / P_refA.
        q_a = np.where(good, raw * poly_eff / np.where(ref_a > 0, ref_a, 1.0), 1.0)
        row_b = next(r for r in val["rows"]
                     if r.get("steps") == steps and "calibration" in r["config"])
        pk_b = np.array(row_b["pk"])
        err_b = np.where(good, pk_b / np.where(ref_b > 0, ref_b, 1.0) - 1.0, 0.0)
        corr = float(np.corrcoef((q_a - 1.0)[good], err_b[good])[0, 1])
        entry = {
            "steps": steps,
            "corr_stageA_residual_vs_stageB_error": round(corr, 3),
            "baseline_max_err_indep_pct": row_b["max_err_vs_indep_pct"],
            "baseline_mean_err_indep_pct": row_b["mean_err_vs_indep_pct"],
            "gates": [],
        }
        for gate in GATES:
            q = np.where((counts >= gate) & good, q_a, 1.0)
            err2 = np.abs((pk_b / q) / np.where(ref_b > 0, ref_b, 1.0) - 1.0)[good] * 100
            entry["gates"].append({
                "min_modes": gate,
                "max_err_indep_pct": round(float(err2.max()), 2),
                "mean_err_indep_pct": round(float(err2.mean()), 2),
            })
        results["rows"].append(entry)
        g = entry["gates"][0]
        print(f"steps {steps}: corr A->B {corr:+.2f}; binwise(gate>={GATES[0]}) "
              f"max {g['max_err_indep_pct']}% (was {row_b['max_err_vs_indep_pct']}%)")

    worse = all(
        gate["max_err_indep_pct"] >= row["baseline_max_err_indep_pct"]
        for row in results["rows"] for gate in row["gates"]
    )
    # The decision-relevant bar: does ANY binwise gate beat the best
    # smooth-radial row (the production pick)?  Per-row improvements that
    # stay above that bar are estimator noise shuffling between bins, not
    # a better serving configuration.
    best_baseline = min(
        row["baseline_max_err_indep_pct"] for row in results["rows"]
    )
    best_binwise = min(
        gate["max_err_indep_pct"]
        for row in results["rows"] for gate in row["gates"]
    )
    if worse:
        results["verdict"] = (
            "binwise radial calibration does NOT validate out-of-sample: the "
            "stage-A residual is ~half estimator noise (corr ~0.5) and dividing "
            "by it raises the independent-reference error — the remaining w=2 "
            "excess over the floor is Monte-Carlo noise, not removable bias"
        )
    elif best_binwise >= best_baseline:
        results["verdict"] = (
            "binwise radial calibration does not beat the best smooth-radial "
            f"row ({best_binwise}% vs {best_baseline}% max-bin independent): "
            "isolated per-row gains are within the estimator noise the low "
            "stage-A->stage-B correlation predicts — production pick unchanged"
        )
    else:
        results["verdict"] = (
            "binwise beats the best smooth-radial row — re-check docs"
        )
    print("verdict:", results["verdict"])
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
