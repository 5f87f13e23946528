#!/usr/bin/env python
"""Refit a spectral calibration at high statistics: smooth + binwise residual.

Round-4 N=16384 finding (artifacts/certification/n16k/*): the calibrated
strided-500 w=2 row's residual vs the exact chain is NOT Monte-Carlo noise —
at 16384 maps (floor 0.99% max-bin) it resolves into

  * a smooth misfit of the original N=4096 deg-6 polynomial (that fit's own
    estimator noise plus power-basis edge error): a +1.3% low-k bump at
    k~0.2-0.4 and a ~+0.4% broadband offset;
  * a bin-local anomaly in the two near-Nyquist corner bins, which hold
    only the 8/5 highest-|k| diagonal modes where the strided sampler's
    bias is direction-dependent, so no radial-smooth model can follow it.
    With all three N=16384 references in hand the two bins decompose
    differently: i=44 (+1.4-1.5% vs A, B AND C, reference spread <0.2%
    there) is real sampler structure; i=45 reads -2.4/-1.8/-0.4% vs
    A/B/C — consistent with a true ~-1.2% offset plus per-reference
    estimator noise of ~0.8% (the corner inflation in inflation_profile
    below), which is exactly what the James-Stein shrinkage is for.

This script refits the residual of an ALREADY-CALIBRATED high-statistics run
against the exact-chain reference (both from certify_fast_sampler pk_cache
npz files), as:

  1. a weighted Chebyshev fit in k of the per-bin residual ratio
     r_i = P_cal(i) / P_ref(i) — the smooth component, with per-bin noise
     sigma_i = infl(k) / sqrt(modes_i) * sqrt(1/N_cal + 1/N_ref)
     (infl is the measured non-Gaussian inflation over the Gaussian 1/sqrt(M)
     mode-counting noise: ~1 at k<0.45, ~2.3 mid-band, ~2.0 near the corner
     — pooled from every committed independent exact-chain realization, see
     artifacts/certification/n16k/noise_model.md);
  2. binwise overrides for bins whose residual deviates from the smooth fit
     by more than --z-gate sigma (the corner anomaly), James-Stein shrunk by
     lambda = blip^2 / (blip^2 + sigma^2) so a noisy blip estimate is not
     copied verbatim into the filter.

The result is saved as a NEW calibration npz: the base calibration's
polynomial untouched, plus a ``bin_ratios`` table (one entry per linear P(k)
bin) composed on top (diffusion/calibration.py total_ratio).  Because every
Fourier mode in bin i is scaled by the same factor, the binned mean P(k)
divides by exactly bin_ratios[i] — the correction is bin-exact in
expectation, with fit noise only from the inputs.

Honest accounting: the fit consumes the seed-A reference; validation MUST be
scored against references that never entered any fit (seed B / seed C —
scripts/score_n16k_final.py), on a run with fresh sampling seeds
(certify_fast_sampler --cal-seed-base).

Usage:
  python scripts/fit_binwise_residual.py \
      --base-calib artifacts/certification/calib_w2_500.npz \
      --cal-pk  <pk_cache>/strided_DDPM_500___spectral_calibration.npz \
      --ref-pk  <pk_cache>/DDPM_1500_seed_A.npz \
      -o /tmp/calib_w2_500_n16k.npz
"""

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Host-side fitting only — force CPU so this can run alongside a TPU job
# (the axon plugin ignores JAX_PLATFORMS; jax.config works, CLAUDE.md).
import jax

jax.config.update("jax_platforms", "cpu")


def inflation_profile(k):
    """Measured non-Gaussian inflation of per-bin P(k) estimator noise over
    the Gaussian 1/sqrt(modes) law, pooled over every committed independent
    exact-chain reference realization (w=0 and w=2 at N=4096, the three
    w=2 N=16384 seeds; scripts/measure_noise_inflation.py regenerates the
    table — artifacts/certification/n16k/noise_model.md).  Large scales
    (k < ~0.45) measure sub-Gaussian (0.7 pooled) and are clamped at the
    Gaussian floor 1.0; the non-linear mid-band carries ~2.2-2.3x from mode
    coupling; the near-Nyquist corner zone (k>4.15: bins 43-45) pools to
    ~2.0x over 12 dof — an earlier 1.3 estimate from two realizations was
    an underdraw: the three N=16384 references alone disagree by up to
    2.0% at the 5-mode bin."""
    k = np.asarray(k, np.float64)
    return np.where(k < 0.45, 1.0, np.where(k > 4.15, 2.0, 2.3))


def fit_binwise(k_bins, counts, res, sigma, cheb_deg, corner_k=4.25,
                min_binwise_modes=8):
    """Weighted Chebyshev fit of the residual + shrunk binwise component.

    The corner zone (k > ``corner_k``: the two highest bins, holding only
    the near-Nyquist diagonal modes where the sampler bias is measurably
    direction-dependent) is excluded from the smooth fit — a weighted
    polynomial otherwise bends its edge through the corner anomaly instead
    of flagging it.  The smooth fit is evaluated with k clamped to its
    fitted range (no edge extrapolation).

    Every bin then receives a positive-part James-Stein correction toward
    its own measured residual: blip = res - fit, lambda = max(0, 1 -
    (sigma/blip)^2).  Pure-noise bins (|blip| <= sigma) stay on the smooth
    fit; strongly significant bin-local anomalies (the corner) are followed
    almost fully; marginal ones are followed partially — the shrinkage is
    the Bayes linear estimator given the per-bin noise model, so the fit
    never copies estimator noise verbatim into the filter.

    Bins holding fewer than ``min_binwise_modes`` Fourier modes receive NO
    binwise follow (lambda forced to 0; they stay on the smooth fit).
    Measured justification (SPEEDUP.md, w=2 N=16384→65536 out-of-sample):
    at the 5-mode Nyquist-corner bin the shrunk binwise term followed a
    ~2.4σ calibration-run fluctuation and overshot the fresh-seed
    validation by its full size (+2.97% vs mean(B,C)); the exact
    counterfactual without that one entry scores 0.89% (p=0.21).  A
    per-bin correction simply cannot be estimated from one run at <8
    modes.  ``min_binwise_modes=0`` restores the round-4 behavior.

    Returns (table_values, smooth_fit, lambda_shrink, corner_mask)."""
    k = np.asarray(k_bins, np.float64)
    res = np.asarray(res, np.float64)
    sigma = np.asarray(sigma, np.float64)
    w = 1.0 / sigma
    corner = k > corner_k
    keep = ~corner
    deg = min(cheb_deg, keep.sum() - 1)
    coef = np.polynomial.chebyshev.chebfit(k[keep], res[keep], deg, w=w[keep])
    k_eval = np.clip(k, k[keep].min(), k[keep].max())
    fit = np.polynomial.chebyshev.chebval(k_eval, coef)
    blip = res - fit
    with np.errstate(divide="ignore"):
        lam = np.maximum(0.0, 1.0 - (sigma / np.where(blip == 0, np.inf,
                                                      blip)) ** 2)
    lam = np.where(np.asarray(counts) >= min_binwise_modes, lam, 0.0)
    table = fit + lam * blip
    return table, fit, lam, corner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-calib", required=True,
                    help="calibration npz the --cal-pk run was generated with")
    ap.add_argument("--cal-pk", required=True,
                    help="pk_cache npz of the CALIBRATED fast-sampler run")
    ap.add_argument("--ref-pk", required=True,
                    help="pk_cache npz of the exact-chain reference (seed A)")
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--cheb-deg", type=int, default=10)
    ap.add_argument("--min-binwise-modes", type=int, default=8,
                    help="bins with fewer Fourier modes get no binwise "
                         "follow (stay on the smooth fit); 0 restores the "
                         "round-4 behavior.  Measured: <8-mode binwise "
                         "entries chase estimator noise (SPEEDUP.md)")
    ap.add_argument("--corner-k", type=float, default=4.25,
                    help="bins above this |k| are excluded from the smooth "
                         "fit and handled binwise (near-Nyquist corner zone)")
    ap.add_argument("--size", type=int, default=64,
                    help="map size of the linear binning the table indexes")
    args = ap.parse_args()

    from camels_diffusion_model_tpu.diffusion.calibration import (
        SpectralCalibration,
        load_calibration_meta,
    )
    from camels_diffusion_model_tpu.ops.spectrum import _linear_bin_info

    base = SpectralCalibration.load(args.base_calib)
    base_meta = load_calibration_meta(args.base_calib)
    cal = np.load(args.cal_pk)
    ref = np.load(args.ref_pk)

    # Provenance hygiene: both spectra and the base calibration must belong
    # to the same checkpoint.  pk_cache fingerprints are
    # "<ckpt_md5>:T<T>:<scaling>:p<n>[:<calib_md5>...]"; the calibrated run's
    # must ALSO embed the md5 of the base calibration file (i.e. the run was
    # actually generated with --base-calib's filter, not some other fit).
    ckpt_fp = str(ref["fingerprint"]).split(":")[0]
    cal_fp_parts = str(cal["fingerprint"]).split(":")
    if cal_fp_parts[0] != ckpt_fp:
        raise SystemExit(
            f"--cal-pk checkpoint {cal_fp_parts[0]} != --ref-pk {ckpt_fp}"
        )
    base_ckpt = base_meta.get("checkpoint_fingerprint")
    if base_ckpt != ckpt_fp:
        raise SystemExit(
            f"--base-calib was fitted to checkpoint {base_ckpt}, but the "
            f"spectra come from {ckpt_fp}"
        )
    h = hashlib.md5()
    with open(args.base_calib, "rb") as f:
        h.update(f.read())
    base_md5 = h.hexdigest()
    if base_md5 not in cal_fp_parts:
        raise SystemExit(
            f"--cal-pk was not generated with --base-calib (its fingerprint "
            f"{str(cal['fingerprint'])!r} does not embed md5 {base_md5})"
        )
    if int(cal["n_eval"]) <= 0 or int(ref["n_eval"]) <= 0:
        raise SystemExit("spectra carry no n_eval")
    if float(cal["guide_w"]) != float(ref["guide_w"]):
        raise SystemExit("guide_w mismatch between --cal-pk and --ref-pk")

    _, counts, n_bins, k_bins = _linear_bin_info((args.size, args.size),
                                                 base.dl)
    counts = np.asarray(counts, np.float64)
    k_bins = np.asarray(k_bins, np.float64)
    pk_cal = np.asarray(cal["pk"], np.float64)
    pk_ref = np.asarray(ref["pk"], np.float64)
    if pk_cal.size != n_bins or pk_ref.size != n_bins:
        raise SystemExit(
            f"spectra have {pk_cal.size} bins; --size {args.size} binning "
            f"has {n_bins}"
        )
    good = (k_bins > 0) & (counts > 0)
    good &= np.isfinite(pk_ref) & (pk_ref > 0) & np.isfinite(pk_cal)
    res = pk_cal[good] / pk_ref[good]
    n_pair = 1.0 / int(cal["n_eval"]) + 1.0 / int(ref["n_eval"])
    sigma = (inflation_profile(k_bins[good])
             / np.sqrt(counts[good]) * np.sqrt(n_pair))

    table_good, fit, lam, corner = fit_binwise(
        k_bins[good], counts[good], res, sigma, args.cheb_deg, args.corner_k,
        min_binwise_modes=args.min_binwise_modes,
    )
    table = np.ones(n_bins, np.float64)
    table[good] = np.clip(table_good, 0.9, 1.1)

    refit = SpectralCalibration(
        coeffs=base.coeffs, k_min=base.k_min, k_max=base.k_max, dl=base.dl,
        clip=base.clip, bin_ratios=tuple(float(v) for v in table),
    )
    gi = np.where(good)[0]
    meta = dict(base_meta)
    meta.update({
        "checkpoint_fingerprint": ckpt_fp,
        "refit_from_cal_pk": os.path.basename(args.cal_pk),
        "refit_from_ref_pk": os.path.basename(args.ref_pk),
        "refit_base_calib_md5": base_md5,
        "refit_n_eval_cal": int(cal["n_eval"]),
        "refit_n_eval_ref": int(ref["n_eval"]),
        "refit_cheb_deg": args.cheb_deg,
        "refit_corner_k": args.corner_k,
        "refit_corner_bins": gi[corner].tolist(),
        "refit_min_binwise_modes": args.min_binwise_modes,
    })
    refit.save(args.out, meta=meta)

    print(f"refit over {good.sum()} bins (N_cal={int(cal['n_eval'])}, "
          f"N_ref={int(ref['n_eval'])}, w={float(cal['guide_w']):g})")
    print(f"{'bin':>4} {'k':>6} {'modes':>5} {'res-1%':>7} {'fit-1%':>7} "
          f"{'z':>6} {'lam':>5} {'table-1%':>8}")
    z = (res - fit) / sigma
    for j, i in enumerate(gi):
        mark = " CORNER" if corner[j] else ""
        print(f"{i:>4} {k_bins[i]:6.3f} {int(counts[i]):>5} "
              f"{100 * (res[j] - 1):7.2f} {100 * (fit[j] - 1):7.2f} "
              f"{z[j]:6.1f} {lam[j]:5.2f} {100 * (table[i] - 1):8.2f}{mark}")
    in_sample = res / table[gi]
    print(f"in-sample |res-1|: max {100 * np.abs(res - 1).max():.2f}% -> "
          f"{100 * np.abs(in_sample - 1).max():.2f}%  (validate OUT-OF-SAMPLE "
          "vs untouched references; this number is optimistic by "
          "construction)")
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
