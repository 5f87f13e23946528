#!/usr/bin/env python
"""Does a fitted spectral calibration transfer across model retrains?

Serving contract question (round-3 verdict, Weak #5): stage A fits the
radial calibration to ONE trained checkpoint; if the strided sampler's
spectral residual is a property of the *sampler discretization*, the fit
transfers to retrains — if it is a property of the *weights*, deployment
needs a per-model stage A.  This script measures it from artifacts alone:

  * old sweep: the round-3 committed stage-A json + calib npz (read from
    git history — the checkpoint behind them is gone, but the measured
    spectra and fits are still evidence);
  * new sweep: the round-4 stage-A json + calib npz fitted to the committed
    checkpoint.

Per step count, reports (a) the raw strided/exact ratio curves' agreement
between the two models, (b) the fitted calibration curves' agreement, and
(c) the cross-application residual: new model's raw spectrum corrected by
the OLD model's calibration, scored against the new exact chain — the
direct "deploy yesterday's fit on today's model" experiment.

Usage:
  python scripts/calibration_transfer_diff.py \
      [--old-rev <git rev>] [--new-dir artifacts/certification] [--steps ...]
"""

import argparse
import io
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def git_show(rev, path):
    return subprocess.run(
        ["git", "show", f"{rev}:{path}"], capture_output=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout


def load_old(rev):
    sweep = json.loads(git_show(rev, "artifacts/certification_r3/sweep_w2_n4096.json"))
    calibs = {}
    for s in (440, 500, 560, 620, 680, 750, 900):
        try:
            raw = git_show(rev, f"artifacts/certification_r3/calib_w2_{s}.npz")
        except subprocess.CalledProcessError:
            continue
        calibs[s] = np.load(io.BytesIO(raw))
    return sweep, calibs


def ratio_of(sweep, steps):
    k = np.asarray(sweep["k_bins"])
    ref = np.asarray(sweep["pk_ddpm_ref"])
    row = next(r for r in sweep["rows"]
               if r.get("steps") == steps and r["config"].startswith("strided")
               and "calibration" not in r["config"])
    pk = np.asarray(row["pk"])
    good = (k > 0) & (ref > 0) & np.isfinite(ref) & np.isfinite(pk)
    return k, pk, ref, good


def calib_ratio(z, k):
    from camels_diffusion_model_tpu.diffusion.calibration import (
        SpectralCalibration,
    )

    c = SpectralCalibration(
        coeffs=tuple(float(v) for v in z["coeffs"]),
        k_min=float(z["k_min"]), k_max=float(z["k_max"]),
        dl=float(z["dl"]), clip=(float(z["clip"][0]), float(z["clip"][1])),
    )
    return c.ratio(k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-rev", default="b4bba03",
                    help="git rev holding the round-3 artifacts")
    ap.add_argument("--new-dir", default="artifacts/certification")
    ap.add_argument("--steps", type=int, nargs="*",
                    default=[440, 500, 560, 620, 680, 750, 900])
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()

    old_sweep, old_calibs = load_old(args.old_rev)
    with open(os.path.join(args.new_dir, "sweep_w2_n4096.json")) as f:
        new_sweep = json.load(f)

    print(f"old model: {old_sweep.get('checkpoint_fingerprint', 'unstamped')}"
          f" (rev {args.old_rev}); new model: "
          f"{new_sweep.get('checkpoint_fingerprint')}")
    results = {"old_rev": args.old_rev,
               "old_fingerprint": old_sweep.get("checkpoint_fingerprint"),
               "new_fingerprint": new_sweep.get("checkpoint_fingerprint"),
               "rows": []}
    hdr = ("| steps | raw max err old | new | raw-ratio curve diff "
           "(max/mean) | fit curve diff (max) | cross-apply resid "
           "(max/mean) | own-fit resid (max/mean) |")
    print(hdr)
    print("|" + "---|" * 7)
    for s in args.steps:
        try:
            k_o, pk_o, ref_o, g_o = ratio_of(old_sweep, s)
            k_n, pk_n, ref_n, g_n = ratio_of(new_sweep, s)
        except StopIteration:
            continue
        g = g_o & g_n
        r_old = pk_o[g] / ref_o[g]
        r_new = pk_n[g] / ref_n[g]
        curve_diff = np.abs(r_new / r_old - 1)
        row = {
            "steps": s,
            "raw_max_err_old_pct": round(100 * np.abs(r_old - 1).max(), 2),
            "raw_max_err_new_pct": round(100 * np.abs(r_new - 1).max(), 2),
            "ratio_curve_diff_max_pct": round(100 * curve_diff.max(), 2),
            "ratio_curve_diff_mean_pct": round(100 * curve_diff.mean(), 2),
        }
        fit_cell = cross_cell = own_cell = "-"
        new_calib_path = os.path.join(args.new_dir, f"calib_w2_{s}.npz")
        if s in old_calibs and os.path.exists(new_calib_path):
            z_old = old_calibs[s]
            z_new = np.load(new_calib_path)
            fit_old = calib_ratio(z_old, k_n[g])
            fit_new = calib_ratio(z_new, k_n[g])
            fdiff = np.abs(fit_new / fit_old - 1)
            row["fit_curve_diff_max_pct"] = round(100 * fdiff.max(), 2)
            fit_cell = f"{row['fit_curve_diff_max_pct']}%"
            # cross-application: new raw spectrum / old fit vs new reference
            resid_x = np.abs((pk_n[g] / fit_old) / ref_n[g] - 1)
            row["cross_apply_max_pct"] = round(100 * resid_x.max(), 2)
            row["cross_apply_mean_pct"] = round(100 * resid_x.mean(), 2)
            cross_cell = (f"{row['cross_apply_max_pct']}%/"
                          f"{row['cross_apply_mean_pct']}%")
            resid_o = np.abs((pk_n[g] / fit_new) / ref_n[g] - 1)
            row["own_fit_max_pct"] = round(100 * resid_o.max(), 2)
            row["own_fit_mean_pct"] = round(100 * resid_o.mean(), 2)
            own_cell = (f"{row['own_fit_max_pct']}%/"
                        f"{row['own_fit_mean_pct']}%")
        results["rows"].append(row)
        print(f"| {s} | {row['raw_max_err_old_pct']}% | "
              f"{row['raw_max_err_new_pct']}% | "
              f"{row['ratio_curve_diff_max_pct']}%/"
              f"{row['ratio_curve_diff_mean_pct']}% | {fit_cell} | "
              f"{cross_cell} | {own_cell} |")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"written: {args.out}")


if __name__ == "__main__":
    main()
