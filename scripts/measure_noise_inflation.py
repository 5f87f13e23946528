#!/usr/bin/env python
"""Measure the non-Gaussian inflation of per-bin P(k) estimator noise.

The mean P(k) of N sampled maps carries per-bin Monte-Carlo noise.  For
Gaussian-random Fourier modes the relative sigma of a bin holding M modes is
1/sqrt(M*N); real sampled maps are non-Gaussian (mode coupling), inflating
it by a k-dependent factor.  That inflation profile is load-bearing twice:

  * scripts/fit_binwise_residual.py uses it as the per-bin sigma of the
    James-Stein shrinkage — too SMALL a value makes the binwise refit
    overconfident and copies one reference realization's corner noise into
    the serving filter;
  * scripts/score_n16k_final.py uses it for the zero-bias consistency
    p-values of the N=16384 confirmation.

This script measures it from committed artifacts alone: every certification
json carries the exact-chain reference spectrum (pk_ddpm_ref, seed A) plus
one or more INDEPENDENT-seed exact-chain rows — each (guide_w, N) group is a
set of i.i.d. realizations of the same estimator.  Per bin, the pooled
inflation is

    infl_b = sqrt( sum_g (n_g - 1) * s2_gb / sg2_gb  /  sum_g (n_g - 1) )

where s2_gb is the group's unbiased sample variance of P_b/mean(P_b) - 1 and
sg2_gb = 1/(modes_b * N_g) the Gaussian law.  Spectra are deduped by hash
(validation jsons re-quote the sweep's references via --ref-from).

Round-4 result (7 independent runs: 2+2 at N=4096 w0/w2, 3 at N=16384
w2; 4 dof per bin): k<0.45 pools to ~0.75 (clamped at the Gaussian floor
1.0), mid-band ~2.26, corner zone (k>4.15: bins 43-45, 16/8/5 modes)
~2.04 over 12 dof.  An earlier corner estimate of 1.3 from two realizations was an
underdraw — the three N=16384 references alone disagree by up to 2.0% at
the 5-mode bin.  (The round-3 artifacts in git history replicate the zone
numbers on a different model but share sampler RNG seeds with the round-4
runs, so they add little independent information and are excluded here.)

Usage:  python scripts/measure_noise_inflation.py [--md artifacts/...md]
"""

import argparse
import glob
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collect_groups():
    """Return {(guide_w, N): [pk, ...]} of deduped independent references."""
    paths = sorted(
        glob.glob(os.path.join(REPO, "artifacts/certification/*.json"))
        + glob.glob(
            os.path.join(REPO, "artifacts/certification/n16k/w*/refs_certification.json")
        )
    )
    groups, seen = {}, set()
    for path in paths:
        try:
            with open(path) as f:
                d = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        if "pk_ddpm_ref" not in d or "rows" not in d:
            continue
        key = (float(d["guide_w"]), int(d["n_eval_maps"]))
        k = np.asarray(d["k_bins"], np.float64)
        cands = [np.asarray(d["pk_ddpm_ref"], np.float64)]
        for r in d["rows"]:
            if "independent seed" in r.get("config", "") and "pk" in r:
                cands.append(np.asarray(r["pk"], np.float64))
        for pk in cands:
            h = hashlib.md5(pk.tobytes()).hexdigest()
            if h in seen:
                continue
            seen.add(h)
            groups.setdefault(key, {"k": k, "runs": []})["runs"].append(pk)
    return groups


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--md", help="also write a markdown report here")
    args = ap.parse_args()

    from camels_diffusion_model_tpu.ops.spectrum import _linear_bin_info

    _, counts, n_bins, k_bins = _linear_bin_info((64, 64), 1.0)
    counts = np.asarray(counts, np.float64)
    k_bins = np.asarray(k_bins, np.float64)

    groups = collect_groups()
    num = np.zeros(n_bins)
    dof = np.zeros(n_bins)
    lines = ["| guide_w | N | independent runs |", "|---|---|---|"]
    for (w, N), g in sorted(groups.items()):
        n = len(g["runs"])
        lines.append(f"| {w:g} | {N} | {n} |")
        print(f"group w={w:g} N={N}: {n} independent runs")
        if n < 2:
            continue
        P = np.stack(g["runs"])
        good = (k_bins > 0) & np.all(P > 0, axis=0)
        rel = P / np.mean(P, axis=0) - 1.0
        s2 = rel.var(axis=0, ddof=1)
        sg2 = 1.0 / (counts * N)
        with np.errstate(divide="ignore", invalid="ignore"):
            chi = np.where(good, s2 / sg2, 0.0)
        num += (n - 1) * chi
        dof += np.where(good, n - 1, 0)

    with np.errstate(divide="ignore", invalid="ignore"):
        infl = np.sqrt(num / np.maximum(dof, 1e-12))

    header = "| bin | k | modes | pooled inflation | dof |"
    table = [header, "|---|---|---|---|---|"]
    print(f"\n{'bin':>3} {'k':>6} {'modes':>5} {'infl':>6} {'dof':>3}")
    for b in range(n_bins):
        if dof[b] == 0:
            continue
        print(f"{b:3d} {k_bins[b]:6.3f} {counts[b]:5.0f} {infl[b]:6.2f} "
              f"{dof[b]:3.0f}")
        table.append(f"| {b} | {k_bins[b]:.3f} | {counts[b]:.0f} | "
                     f"{infl[b]:.2f} | {dof[b]:.0f} |")

    zones = []
    for name, m in [("k<0.45", (k_bins < 0.45) & (k_bins > 0)),
                    ("0.45<=k<=4.15", (k_bins >= 0.45) & (k_bins <= 4.15)),
                    ("corner k>4.15", k_bins > 4.15)]:
        m = m & (dof > 0)
        z = float(np.sqrt(num[m].sum() / dof[m].sum()))
        zones.append((name, z, float(dof[m].sum())))
        print(f"zone {name}: pooled inflation {z:.2f} (dof {dof[m].sum():.0f})")

    if args.md:
        prof_src = ("scripts/fit_binwise_residual.py::inflation_profile "
                    "(1.0 / 2.3 / 2.0)")
        with open(args.md, "w") as f:
            f.write(
                "# P(k) estimator noise model — measured inflation profile\n\n"
                "Generated by `python scripts/measure_noise_inflation.py "
                f"--md {os.path.relpath(args.md, REPO)}` from committed "
                "certification artifacts (see the script docstring for the "
                "estimator).\n\n## Input groups\n\n"
                + "\n".join(lines)
                + "\n\n## Zone pooling\n\n"
                + "\n".join(f"* **{n}**: {z:.2f} (dof {d:.0f})"
                            for n, z, d in zones)
                + f"\n\nProfile in use: {prof_src}; low-k clamped at the "
                "Gaussian floor.\n\n## Per-bin table\n\n"
                + "\n".join(table) + "\n"
            )
        print(f"\nwritten: {args.md}")


if __name__ == "__main__":
    main()
