#!/usr/bin/env python
"""Fit a spectral calibration from a certification sweep row.

Reads a certify_fast_sampler certification.json, takes one config's mean
P(k) as the calibration set and the sweep's exact-chain DDPM reference as
the target, fits the smooth transfer (diffusion/calibration.py), and saves
the .npz sidecar for the serving path (CAMELS_CALIBRATION=...) and for
out-of-sample validation via certify_fast_sampler --calibrated.

Usage:
  python scripts/fit_calibration.py /tmp/cert/certification.json \
      "strided DDPM 420" -o /tmp/calib_w0_420.npz [--deg 6]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Host-side fitting only — force CPU so this can run alongside a TPU job
# (the axon plugin ignores JAX_PLATFORMS; jax.config works, CLAUDE.md).
import jax

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cert_json")
    ap.add_argument("config")
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--deg", type=int, default=6)
    args = ap.parse_args()

    from camels_diffusion_model_tpu.diffusion.calibration import (
        fit_spectral_transfer,
    )
    from camels_diffusion_model_tpu.ops.spectrum import _linear_bin_info

    with open(args.cert_json) as f:
        cert = json.load(f)
    row = next(r for r in cert["rows"] if r["config"] == args.config)
    k = np.asarray(cert["k_bins"])
    pk_ref = np.asarray(cert["pk_ddpm_ref"])
    pk_fast = np.asarray(row["pk"])
    # mode counts of the 64x64 linear binning weight the fit
    _, counts, _, _ = _linear_bin_info((64, 64), 1.0)

    # Stamp provenance at fit time: calibrations are model-specific, so the
    # sweep MUST carry the checkpoint fingerprint and every consumer verifies
    # it (certify_fast_sampler --calibrated, bench.py).  Refusing unstamped
    # sweeps here is what makes a stale-calibration/retrained-model pairing
    # impossible downstream.
    ckpt_fp = cert.get("checkpoint_fingerprint")
    if not ckpt_fp or ckpt_fp == "none":
        raise SystemExit(
            f"{args.cert_json} carries no checkpoint_fingerprint — regenerate "
            "the sweep with the current certify_fast_sampler.py (which stamps "
            "it) before fitting a calibration"
        )

    calib = fit_spectral_transfer(k, pk_fast, pk_ref, deg=args.deg,
                                  counts=counts)
    calib.save(args.out, meta={
        "checkpoint_fingerprint": ckpt_fp,
        "fit_config": row["config"],
        "guide_w": cert["guide_w"],
        "timesteps": cert["timesteps"],
        "scaling": cert["scaling"],
        "n_eval_maps": cert["n_eval_maps"],
        "deg": args.deg,
    })

    good = (k > 0) & np.isfinite(pk_ref) & (pk_ref > 0)
    raw = pk_fast[good] / pk_ref[good] - 1
    fit = calib.ratio(k[good]) - 1
    resid = (pk_fast[good] / calib.ratio(k[good])) / pk_ref[good] - 1
    print(f"config: {row['config']}  (N={cert['n_eval_maps']}, "
          f"w={cert['guide_w']})")
    print(f"raw   : max|r-1| {np.abs(raw).max()*100:.2f}%  "
          f"mean {np.abs(raw).mean()*100:.2f}%")
    print(f"fit   : max|r-1| {np.abs(fit).max()*100:.2f}%  (smooth transfer)")
    print(f"resid : max|r-1| {np.abs(resid).max()*100:.2f}%  "
          f"mean {np.abs(resid).mean()*100:.2f}%  "
          f"(in-sample; validate out-of-sample with --calibrated)")
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
