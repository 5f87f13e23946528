#!/usr/bin/env python
"""Post-hoc analysis of a certify_fast_sampler certification.json.

The strided-DDPM residual vs the exact chain is a smooth SIGNED broadband
P(k) offset that crosses zero as a function of step count (SPEEDUP.md).
This script reports, per config: the signed mean offset, max |ratio-1|,
throughput — and for the strided family, the interpolated zero crossing of
the signed offset, i.e. the step count at which the strided chain's
spectrum statistically coincides with the exact 1500-step reference.

Usage: python scripts/analyze_cert.py /tmp/cert_r3/certification.json
"""

import json
import sys

import numpy as np


def main():
    path = sys.argv[1]
    with open(path) as f:
        cert = json.load(f)
    k = np.asarray(cert["k_bins"])
    ref = np.asarray(cert["pk_ddpm_ref"])
    good = (k > 0) & np.isfinite(ref) & (ref > 0)

    print(f"guide_w={cert['guide_w']}  N={cert['n_eval_maps']}  "
          f"floor(max-bin)={cert['noise_floor_max_pct']}%  "
          f"tolerance={cert['certify_tolerance_pct']}%\n")
    print(f"{'config':38s} {'steps':>6s} {'maps/min':>9s} "
          f"{'max|r-1|%':>10s} {'mean|r-1|%':>10s} {'signed mean %':>13s}")
    strided = []
    for r in cert["rows"]:
        pk = np.asarray(r["pk"])
        ratio = pk[good] / ref[good]
        signed = float(np.mean(ratio - 1.0)) * 100
        print(f"{r['config']:38s} {r['steps']:>6d} "
              f"{str(r['maps_per_min']):>9s} "
              f"{r['max_err_vs_ddpm1500_pct']:>10.2f} "
              f"{r['mean_err_vs_ddpm1500_pct']:>10.2f} {signed:>+13.2f}")
        if r["config"].startswith("strided DDPM"):
            strided.append((r["steps"], signed, r["maps_per_min"],
                            r["max_err_vs_ddpm1500_pct"]))

    if len(strided) >= 2:
        strided.sort()
        s = np.asarray([row[0] for row in strided], float)
        off = np.asarray([row[1] for row in strided], float)
        # zero crossing by linear interpolation on the signed offset
        cross = None
        for i in range(len(s) - 1):
            if off[i] == 0 or off[i] * off[i + 1] < 0:
                t = off[i] / (off[i] - off[i + 1]) if off[i] != off[i + 1] else 0
                cross = s[i] + t * (s[i + 1] - s[i])
                break
        slope = np.polyfit(s, off, 1)[0] if len(s) >= 3 else float("nan")
        print(f"\nstrided-DDPM signed-offset slope: {slope:+.4f} %/step")
        if cross is not None:
            print(f"interpolated zero crossing: ~{cross:.0f} steps")
        else:
            print("no zero crossing inside the swept range "
                  f"[{s.min():.0f}, {s.max():.0f}] "
                  f"(offsets {off.min():+.2f}%..{off.max():+.2f}%)")


if __name__ == "__main__":
    main()
