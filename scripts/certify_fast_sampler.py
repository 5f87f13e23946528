#!/usr/bin/env python
"""Certify a >=500 maps/min/chip sampling configuration with proven spectral
fidelity (the BASELINE.md north star's quality clause).

Exact 1500-step CFG math is FLOP-capped at ~281 maps/min/chip on a v5e
(scripts/flop_audit.py); the certified fast path is a reduced-step DDIM
sampler on the SAME trained checkpoint.  This script:

1. trains the canonical 6-param ContextUnet at T=1500 on a full synthetic LH
   set (or reuses an existing checkpoint with --skip-train);
2. samples N_EVAL maps (chunked) with the reference-exact 1500-step
   ancestral DDPM sampler (CFG w=2) — the quality reference — plus a SECOND
   independent DDPM run whose deviation from the first measures the
   Monte-Carlo noise floor of the mean-P(k) estimator itself (the lowest
   populated k-bin has ~6 modes -> sqrt(2/(6N)) relative noise);
3. samples the SAME per-slice x_init/params with strided-ancestral
   (DDIM eta=1, the same SDE family as the reference sampler) and DDIM
   (eta=0) at reduced step counts;
4. computes each config's mean P(k) and the band-max/mean |ratio - 1|
   against (a) the DDPM-1500 output and (b) the training data;
5. scores the reference's FULL statistical battery per config, not just the
   spectrum: pixel-PDF total-variation distance (compare_distributions
   semantics, train_diffusion_paper.py:861-905) and ELBO/BPD of the
   generated maps under the model (paper form, :77-139) — each with its own
   independent-seed noise floor;
6. measures per-config throughput at the bench batch size;
7. writes a markdown table + JSON (-> SPEEDUP.md, BENCH_r02 context).
   Certification = >=500 maps/min AND max error <= max(1%, noise floor);
   ``certified_full_battery`` additionally requires the pixel-PDF and BPD
   clauses (tolerance = max(their floors, 1%)).

Every certification.json is stamped with the md5 of the checkpoint it ran on
(``checkpoint_fingerprint``); calibration npz files carry the same stamp from
fit time and are REJECTED here when they do not match the checkpoint in use.

Usage: python scripts/certify_fast_sampler.py /tmp/cert [epochs]
                                              [--skip-train] [--eval-maps N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("epochs", type=int, nargs="?", default=80)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--eval-maps", type=int, default=1024)
    ap.add_argument("--bench-batch", type=int, default=128)
    ap.add_argument("--timesteps", type=int, default=1500)
    ap.add_argument("--ddim-steps", type=int, nargs="*",
                    default=[100, 250, 500, 600, 750])
    # Hybrid ancestral rows (eta=1): "t_exact:stride" — every step for
    # t <= t_exact (where reduced-step spectral error concentrates), coarse
    # stride above.  Cost: t_exact + ceil((T-t_exact)/stride) evals/map.
    ap.add_argument("--hybrid", nargs="*",
                    default=["600:15", "500:12", "400:10", "300:8", "200:5"])
    # DPM-Solver++(2M) rows (second-order ODE; converges to the DDIM eta=0
    # limit in ~10x fewer evals — bounded below by the SDE/ODE model gap).
    ap.add_argument("--dpm-steps", type=int, nargs="*", default=[25, 50, 100])
    ap.add_argument("--param-sets", type=int, default=500)
    ap.add_argument("--guide-w", type=float, default=2.0)
    # The certified configuration trains with the STANDARD q_sample scaling
    # (sqrt(1-ab), the reference's own main.py:156): the non-standard
    # (1-ab) scaling used by the reference's code/ trainers leaves a noise
    # floor that the ancestral sampler keeps re-injecting but DDIM (eta=0)
    # does not, so the two samplers' spectra diverge ~70% regardless of step
    # count (measured) — certification is only meaningful on a recipe where
    # the 1500-step reference output is itself clean (ARCHITECTURE.md,
    # "Statistical quality validation").
    ap.add_argument("--scaling", choices=["standard", "reference"],
                    default="standard")
    # Which reduced-step families to sweep over --ddim-steps: "strided"
    # (sigma_mode="beta", the only family that converges to the reference
    # chain) is enough for fine valley searches; "both" adds the eta=0 DDIM
    # rows for the record.
    ap.add_argument("--families", choices=["both", "strided", "ddim"],
                    default="both")
    # Reuse the DDPM reference + noise-floor spectra from a previous
    # certification.json (MUST come from the same checkpoint and the same
    # --eval-maps/--param-sets/--guide-w so the estimator protocol matches);
    # skips the two ~12-min full-step reference generations when extending
    # a sweep with more step counts.
    ap.add_argument("--ref-from", default=None,
                    help="path to a prior certification.json to reuse the "
                         "DDPM reference and floor rows from")
    # Calibrated strided rows, out-of-sample validation of a fitted
    # spectral calibration (scripts/fit_calibration.py): "steps:calib.npz"
    ap.add_argument("--calibrated", nargs="*", default=[])
    # Sampling-seed base for the calibrated rows.  The default (5000) is the
    # stage-B protocol; a refit validation (scripts/fit_binwise_residual.py)
    # MUST use a different base so its maps are fresh draws, not the exact
    # maps the refit's residuals were measured on (same PRNGKey => identical
    # sampler output).
    ap.add_argument("--cal-seed-base", type=int, default=5000)
    # Generate one MORE independent exact-chain DDPM row ("seed C") with
    # this seed base.  Scoring a validation run against the mean of two
    # untouched references (B and C) halves the reference noise variance —
    # the N=16384 protocol of scripts/score_n16k_final.py.
    ap.add_argument("--extra-floor-seed", type=int, default=None)
    # Allow --ref-from with a different --eval-maps than the reference
    # sweep's: the mean P(k) is an unbiased estimator at any N, so a larger
    # validation run may be scored against smaller-N references (their
    # noise floors stay quoted at their own N).
    ap.add_argument("--ref-eval-ok", action="store_true")
    # Train + checkpoint only (for [re]creating the reference-scale model,
    # e.g. under artifacts/certification/model); the sweep is skipped.
    ap.add_argument("--train-only", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    import jax

    # CPU smoke runs (the axon TPU plugin ignores the JAX_PLATFORMS env
    # var; only the config API works — CLAUDE.md).
    if os.environ.get("CAMELS_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from camels_diffusion_model_tpu.data import (
        batch_iterator,
        load_camels_dataset,
        synthetic_camels,
    )
    from camels_diffusion_model_tpu.data.pipeline import num_batches
    from camels_diffusion_model_tpu.diffusion import make_schedule, sample_ddpm
    from camels_diffusion_model_tpu.diffusion.ddim import sample_ddim
    from camels_diffusion_model_tpu.diffusion.likelihood import (
        calculate_elbo_and_bpd,
    )
    from camels_diffusion_model_tpu.models import ContextUnet
    from camels_diffusion_model_tpu.models.fold_bn import fold_inference
    from camels_diffusion_model_tpu.ops.spectrum import power_spectrum_batch
    from camels_diffusion_model_tpu.training import (
        create_train_state,
        load_train_checkpoint,
        make_train_step,
        save_train_checkpoint,
    )

    T = args.timesteps
    batch_size = 64
    print(f"devices: {jax.devices()}", flush=True)

    # ---- data (full synthetic LH set, same recipe as production) -----------
    raw_maps, raw_params = synthetic_camels(
        n_param_sets=args.param_sets, maps_per_set=15, size=256, seed=42
    )
    ds = load_camels_dataset(
        raw_maps, raw_params, num_params=6, height=64,
        test_size=max(args.param_sets * 15 // 10, 15), seed=42,
    )
    del raw_maps
    print(f"dataset: train {ds.n_train}, test {ds.n_test}", flush=True)

    # ---- model + training ---------------------------------------------------
    model = ContextUnet(
        in_channels=1, n_feat=128, n_cfeat=6, height=64, levels=2,
        dtype=jnp.bfloat16,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 64, 64, 1), np.float32),
        np.array([0.5], np.float32),
    )
    steps_per_epoch = num_batches(ds.n_train, batch_size)
    state = create_train_state(
        model, variables, 1e-4, args.epochs, steps_per_epoch
    )
    ckpt_path = os.path.join(args.outdir, "train_state.msgpack")
    start_epoch = 0
    train_key = jax.random.PRNGKey(7)
    if os.path.exists(ckpt_path):
        state, start_epoch, train_key = load_train_checkpoint(state, ckpt_path)
        print(f"resumed from epoch {start_epoch}", flush=True)
    elif args.skip_train:
        # Certifying fresh random weights is meaningless and, worse, looks
        # plausible in the output tables.  Refuse.
        raise SystemExit(
            f"--skip-train but no checkpoint at {ckpt_path}; train first "
            "(run without --skip-train) or copy train_state.msgpack into "
            "the outdir"
        )

    if not args.skip_train and start_epoch < args.epochs:
        step = make_train_step(model, T, scaling=args.scaling, donate=True)
        rng_np = np.random.default_rng(3)
        for ep in range(start_epoch, args.epochs):
            t0 = time.time()
            loss_acc = jnp.zeros((), jnp.float32)
            n_b = 0
            for bx, bc in batch_iterator(
                ds.train_x, ds.train_c, batch_size, rng=rng_np
            ):
                train_key, k = jax.random.split(train_key)
                state, m = step(state, bx, bc, k)
                loss_acc = loss_acc + m["loss"]
                n_b += 1
            loss = float(loss_acc) / n_b
            print(f"epoch {ep + 1}/{args.epochs}: loss {loss:.5f} "
                  f"({time.time() - t0:.1f}s)", flush=True)
            if (ep + 1) % 10 == 0 or ep == args.epochs - 1:
                save_train_checkpoint(state, ep + 1, train_key, ckpt_path)

    if args.train_only:
        print(f"--train-only: checkpoint at {ckpt_path}; skipping the sweep",
              flush=True)
        return

    inf_model, inf_vars = fold_inference(
        model, {"params": state.params, "batch_stats": state.batch_stats}
    )
    schedule = make_schedule(T)

    # Fingerprint tying cached spectra to the exact model + protocol that
    # produced them: checkpoint file hash, timesteps, scaling, param-set
    # count.  Guards against silently reusing a persistent outdir's pk_cache
    # across a retrained checkpoint or changed protocol (the n_eval/guide_w
    # check alone cannot see those).
    import hashlib

    def _file_md5(p):
        h = hashlib.md5()
        with open(p, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    ckpt_fp = _file_md5(ckpt_path) if os.path.exists(ckpt_path) else "none"
    proto_fp = f"{ckpt_fp}:T{T}:{args.scaling}:p{args.param_sets}"

    # ---- quality sampling ---------------------------------------------------
    # Statistics protocol: the mean P(k) of N sampled maps is a Monte-Carlo
    # estimator — the lowest populated k-bin of a 64x64 map holds only ~6
    # Fourier modes, so its mean over N maps carries ~sqrt(2/(6N)) relative
    # noise (1.1% at N=256, 0.57% at N=1024).  A <=1% max-bin criterion is
    # only meaningful with N >= ~1024 AND an explicit noise-floor row:
    # a second independent DDPM run, whose deviation from the first is the
    # estimator's intrinsic noise (any config matching the reference closer
    # than that floor is statistically indistinguishable from exact).
    # Generation runs in chunks (decoder batch = 2x chunk under CFG).
    n_eval = args.eval_maps
    gen_batch = min(256, n_eval)
    assert n_eval % gen_batch == 0
    eval_params_np = np.tile(
        ds.test_c, (n_eval // ds.test_c.shape[0] + 1, 1)
    )[:n_eval]

    # Per-config P(k) results are cached to disk as they complete so a
    # crashed sweep (tunneled-TPU infrastructure faults are a fact of life)
    # resumes without regenerating finished configs.
    pk_cache_dir = os.path.join(args.outdir, "pk_cache")
    os.makedirs(pk_cache_dir, exist_ok=True)

    def _pk_cache_path(label):
        slug = "".join(c if c.isalnum() else "_" for c in label)
        return os.path.join(pk_cache_dir, f"{slug}.npz")

    # ---- full statistical battery (beyond P(k)) ----------------------------
    # Pixel-PDF: the reference's compare_distributions
    # (train_diffusion_paper.py:861-905) histograms pixels at bin width 0.01.
    # A FIXED bin grid (the reference's joint-min/max grid would change per
    # config) lets per-chunk counts accumulate; with equal pixel counts per
    # map, the pooled density equals the reference's mean of per-map
    # densities.  Distance metric: total-variation, 0.5*sum|p-q|*delta.
    PDF_DELTA = 0.01
    PDF_BINS = np.arange(-3.0, 3.0 + PDF_DELTA / 2, PDF_DELTA)
    # ELBO/BPD (paper form, train_diffusion_paper.py:77-139) of the generated
    # maps under the model: scored on the first chunk with a FIXED rng so the
    # 10 (t, noise) draws are identical across configs — differences are the
    # maps', not the estimator's.
    ELBO_SEED = 4242

    def pdf_tv(p, q):
        return float(
            0.5 * np.abs(np.asarray(p) - np.asarray(q)).sum() * PDF_DELTA
        )

    def gen_elbo_bpd(maps_np, params_np):
        return calculate_elbo_and_bpd(
            inf_model, inf_vars, schedule,
            [(maps_np, params_np)], jax.random.PRNGKey(ELBO_SEED),
        )

    import collections

    GenStats = collections.namedtuple("GenStats", "k pk pdf elbo bpd")

    def gen_mean_pk(sample_slice, label, extra_key=""):
        """sample_slice(x0, params, slice_seed) -> (B, 64, 64, 1) maps; same
        per-slice x_init for every config (shared PRNGKey(100+si)).

        ``extra_key`` folds config state the label can't see into the cache
        fingerprint (e.g. the calibration file's content hash).

        Returns GenStats: mean P(k), pooled pixel PDF on the fixed battery
        grid, and ELBO/BPD of the first chunk under the model."""
        cache_path = _pk_cache_path(label)
        want_fp = proto_fp + (f":{extra_key}" if extra_key else "")
        if os.path.exists(cache_path):
            c = np.load(cache_path)
            # A cache must carry a fingerprint matching the current
            # checkpoint + protocol exactly; legacy caches without one are
            # treated as stale (they could have come from ANY checkpoint).
            # Caches predating the full-battery fields (pdf/elbo) are stale
            # too — regeneration is the only way to score them.
            fp_ok = ("fingerprint" in c.files
                     and str(c["fingerprint"]) == want_fp)
            if (int(c["n_eval"]) == n_eval
                    and float(c["guide_w"]) == args.guide_w and fp_ok
                    and "pdf" in c.files and "bpd" in c.files):
                print(f"  {label}: cached ({cache_path})", flush=True)
                return GenStats(c["k"], c["pk"], c["pdf"],
                                float(c["elbo"]), float(c["bpd"]))
            print(f"  {label}: stale cache ignored ({cache_path})",
                  flush=True)
        t0 = time.time()
        acc = None
        k_out = None
        hist_acc = np.zeros(PDF_BINS.size - 1, np.int64)
        n_pix = 0
        elbo = bpd = None
        for si in range(n_eval // gen_batch):
            x0 = jax.random.normal(
                jax.random.PRNGKey(100 + si), (gen_batch, 64, 64, 1),
                jnp.float32,
            )
            pp = jnp.asarray(eval_params_np[si * gen_batch:(si + 1) * gen_batch])
            maps = sample_slice(x0, pp, si)
            maps_np = np.asarray(maps, np.float32)
            h, _ = np.histogram(maps_np, PDF_BINS)
            hist_acc += h
            n_pix += maps_np.size
            if si == 0:
                elbo, bpd = gen_elbo_bpd(
                    maps_np, eval_params_np[:maps_np.shape[0]]
                )
            k_out, pk = power_spectrum_batch(maps_np[..., 0])
            pk = np.asarray(pk)
            acc = pk.sum(axis=0) if acc is None else acc + pk.sum(axis=0)
        print(f"  {label}: {n_eval} maps in {time.time() - t0:.1f}s",
              flush=True)
        k_out, mean_pk = np.asarray(k_out), acc / n_eval
        pdf = hist_acc / (n_pix * PDF_DELTA)
        np.savez(cache_path, k=k_out, pk=mean_pk, n_eval=n_eval,
                 guide_w=args.guide_w, fingerprint=want_fp,
                 pdf=pdf, elbo=elbo, bpd=bpd)
        return GenStats(k_out, mean_pk, pdf, float(elbo), float(bpd))

    def ddpm_slice(seed_base):
        return lambda x0, pp, si: sample_ddpm(
            inf_model, inf_vars, schedule, jax.random.PRNGKey(seed_base + si),
            n_sample=x0.shape[0], size=64, params=pp, guide_w=args.guide_w,
            x_init=x0, measure_timing=False,
        ).x

    def ddim_slice(n_steps, eta, seed_base, sigma_mode="posterior"):
        return lambda x0, pp, si: sample_ddim(
            inf_model, inf_vars, schedule, jax.random.PRNGKey(seed_base + si),
            n_sample=x0.shape[0], size=64, params=pp, guide_w=args.guide_w,
            n_steps=n_steps, eta=eta, x_init=x0, sigma_mode=sigma_mode,
        ).x

    prev = None
    if args.ref_from:
        with open(args.ref_from) as f:
            prev = json.load(f)
        checks = [("guide_w", args.guide_w), ("timesteps", T),
                  ("scaling", args.scaling)]
        if not args.ref_eval_ok:
            checks.insert(0, ("n_eval_maps", n_eval))
        for field, want in checks:
            assert prev[field] == want, (
                f"--ref-from protocol mismatch: {field}={prev[field]} != {want}"
            )
        if args.ref_eval_ok and prev["n_eval_maps"] != n_eval:
            print(f"--ref-eval-ok: scoring {n_eval}-map rows against "
                  f"{prev['n_eval_maps']}-map references", flush=True)
        # Older certification.json files carry no checkpoint fingerprint;
        # when one is present it must match the checkpoint in use.
        assert prev.get("checkpoint_fingerprint", ckpt_fp) == ckpt_fp, (
            "--ref-from was produced by a DIFFERENT checkpoint "
            f"({prev['checkpoint_fingerprint']} != {ckpt_fp})"
        )
        k_bins = np.asarray(prev["k_bins"])
        pk_ddpm = np.asarray(prev["pk_ddpm_ref"])
        pk_data = np.asarray(prev["pk_data"])
        for field in ("pdf_ddpm_ref", "pdf_data", "bpd_ddpm_ref", "bpd_data",
                      "elbo_ddpm_ref"):
            assert field in prev, (
                f"--ref-from json predates the full statistical battery "
                f"(missing {field}); regenerate the sweep"
            )
        pdf_ddpm = np.asarray(prev["pdf_ddpm_ref"])
        pdf_data = np.asarray(prev["pdf_data"])
        elbo_ddpm, bpd_ddpm = prev["elbo_ddpm_ref"], prev["bpd_ddpm_ref"]
        bpd_data = prev["bpd_data"]
        print(f"reference spectra reused from {args.ref_from}", flush=True)
    else:
        print(f"reference: DDPM {T}-step CFG w={args.guide_w}, "
              f"{n_eval} maps...", flush=True)
        ref_stats = gen_mean_pk(ddpm_slice(200), f"DDPM-{T} seed A")
        k_bins, pk_ddpm = ref_stats.k, ref_stats.pk
        pdf_ddpm, elbo_ddpm, bpd_ddpm = (
            ref_stats.pdf, ref_stats.elbo, ref_stats.bpd
        )
        _, pk_data_all = power_spectrum_batch(ds.train_x[:n_eval, ..., 0])
        pk_data = np.asarray(pk_data_all).mean(axis=0)
        # Training-data battery references: pooled pixel PDF over the same
        # number of maps, and BPD of real data under the model.
        data_maps = np.asarray(ds.train_x[:n_eval], np.float32)
        h_data, _ = np.histogram(data_maps, PDF_BINS)
        pdf_data = h_data / (data_maps.size * PDF_DELTA)
        _, bpd_data = gen_elbo_bpd(
            data_maps[:gen_batch], np.asarray(ds.train_c[:gen_batch])
        )
        bpd_data = float(bpd_data)
        del data_maps

    # populated, non-DC bins (the k=0 bin and empty high-k bins are excluded
    # exactly like the reference's "populated bins" logging)
    good = (k_bins > 0) & np.isfinite(pk_ddpm) & (pk_ddpm > 0)

    def spectral_err(pk, ref):
        r = pk[good] / ref[good]
        return float(np.max(np.abs(r - 1.0))), float(np.mean(np.abs(r - 1.0)))

    # ---- throughput helper ---------------------------------------------------
    bench_params = jnp.asarray(
        np.tile(eval_params_np[:1], (args.bench_batch, 1))
    )

    def throughput(fn):
        fn(0)  # compile + warm
        times = []
        for s in (1, 2):
            t0 = time.time()
            out = fn(s)
            jax.block_until_ready(out.x)
            _ = float(jnp.abs(out.x).sum())
            times.append(time.time() - t0)
        return args.bench_batch / min(times) * 60.0

    rows = []

    def add_row(config, steps, tp, pk, pdf=None, elbo=None, bpd=None,
                note=""):
        e_ddpm = spectral_err(pk, pk_ddpm)
        e_data = spectral_err(pk, pk_data)
        row = {
            "config": config,
            "steps": steps,
            "maps_per_min": round(tp, 1) if tp is not None else None,
            "max_err_vs_ddpm1500_pct": round(100 * e_ddpm[0], 2),
            "mean_err_vs_ddpm1500_pct": round(100 * e_ddpm[1], 2),
            "max_err_vs_data_pct": round(100 * e_data[0], 2),
            "mean_err_vs_data_pct": round(100 * e_data[1], 2),
            "note": note,
            # per-bin data for post-hoc analysis (which k carries the error)
            "pk": [float(v) for v in pk],
        }
        if pdf is not None:
            row["pdf"] = [float(v) for v in pdf]
            row["pdf_tv_vs_ddpm1500"] = round(pdf_tv(pdf, pdf_ddpm), 7)
            row["pdf_tv_vs_data"] = round(pdf_tv(pdf, pdf_data), 7)
        if bpd is not None:
            row["elbo"] = float(elbo)
            row["bpd"] = float(bpd)
            row["bpd_delta_vs_ddpm1500"] = float(bpd) - bpd_ddpm
        rows.append(row)
        battery = ""
        if pdf is not None and bpd is not None:
            battery = (f"; pdf TV {row['pdf_tv_vs_ddpm1500']:.4f}, "
                       f"dBPD {row['bpd_delta_vs_ddpm1500']:+.2e}")
        print(f"  {config}: max|Pk ratio-1| vs DDPM-{T}: "
              f"{100 * e_ddpm[0]:.2f}% (mean {100 * e_ddpm[1]:.2f}%)"
              f"{battery}",
              flush=True)
        return e_ddpm

    if prev is not None:
        tp_ddpm = prev["rows"][0]["maps_per_min"]
        add_row(f"DDPM {T} (reference math)", T, tp_ddpm, pk_ddpm,
                pdf=pdf_ddpm, elbo=elbo_ddpm, bpd=bpd_ddpm)
        floor_row = next(
            r for r in prev["rows"] if "independent seed" in r["config"]
        )
        assert "pdf" in floor_row and "bpd" in floor_row, (
            "--ref-from noise-floor row predates the full statistical "
            "battery; regenerate the sweep"
        )
        floor = add_row(
            f"DDPM {T}, independent seed", T, tp_ddpm,
            np.asarray(floor_row["pk"]), pdf=np.asarray(floor_row["pdf"]),
            elbo=floor_row["elbo"], bpd=floor_row["bpd"],
            note="estimator noise floor",
        )
    else:
        tp_ddpm = throughput(lambda s: sample_ddpm(
            inf_model, inf_vars, schedule, jax.random.PRNGKey(s),
            n_sample=args.bench_batch, size=64, params=bench_params,
            guide_w=args.guide_w, measure_timing=False,
        ))
        add_row(f"DDPM {T} (reference math)", T, tp_ddpm, pk_ddpm,
                pdf=pdf_ddpm, elbo=elbo_ddpm, bpd=bpd_ddpm)
        print(f"DDPM-{T}: {tp_ddpm:.1f} maps/min", flush=True)

        # Noise floor: an INDEPENDENT full-step DDPM run (different sampling
        # noise, different x_init).  Its deviation from seed A is pure
        # estimator noise — the resolution limit of this whole table.
        print("noise-floor: second independent DDPM run...", flush=True)

        def ddpm_slice_b(seed_base):
            return lambda x0, pp, si: sample_ddpm(
                inf_model, inf_vars, schedule,
                jax.random.PRNGKey(seed_base + si),
                n_sample=x0.shape[0], size=64, params=pp,
                guide_w=args.guide_w, measure_timing=False,
            ).x

        stats_b = gen_mean_pk(ddpm_slice_b(7000), f"DDPM-{T} seed B")
        floor = add_row(
            f"DDPM {T}, independent seed", T, tp_ddpm, stats_b.pk,
            pdf=stats_b.pdf, elbo=stats_b.elbo, bpd=stats_b.bpd,
            note="estimator noise floor",
        )
    if args.extra_floor_seed is not None:
        # A second untouched exact-chain reference ("seed C"), fully
        # independent like seed B (own x_init, own noise).  Never enters any
        # fit or the floor; scripts/score_n16k_final.py scores validation
        # rows against mean(B, C) to halve the reference noise variance.
        print("extra reference: third independent DDPM run (seed C)...",
              flush=True)

        def ddpm_slice_x(x0, pp, si):
            return sample_ddpm(
                inf_model, inf_vars, schedule,
                jax.random.PRNGKey(args.extra_floor_seed + si),
                n_sample=x0.shape[0], size=64, params=pp,
                guide_w=args.guide_w, measure_timing=False,
            ).x

        stats_c = gen_mean_pk(ddpm_slice_x, f"DDPM-{T} seed C")
        add_row(
            f"DDPM {T}, independent seed C", T, tp_ddpm, stats_c.pk,
            pdf=stats_c.pdf, elbo=stats_c.elbo, bpd=stats_c.bpd,
            note=f"second untouched reference (seed base "
                 f"{args.extra_floor_seed})",
        )
    # The floor row's own battery distances vs seed A ARE the battery floors.
    floor_row_d = rows[1]
    pdf_floor_tv = floor_row_d.get("pdf_tv_vs_ddpm1500")
    bpd_floor = abs(floor_row_d.get("bpd_delta_vs_ddpm1500", 0.0))

    # "strided DDPM" = the reference chain's own (beta-variance) update with
    # composite-alpha jumps — the only family that converges to the
    # reference's 1500-step output as steps grow.  The eta=1 "posterior"
    # (beta-tilde) DDIM variant is a DIFFERENT stochastic process for an
    # imperfect model: measured, its P(k) gap vs the reference chain
    # plateaus ~25-35% regardless of step count, so it is reported for the
    # record but cannot certify.
    families = (
        ("strided DDPM", 1.0, "beta"),
        ("DDIM", 0.0, "posterior"),
    )
    if args.families == "strided":
        families = families[:1]
    elif args.families == "ddim":
        families = families[1:]
    for n_steps in args.ddim_steps:
        for family, eta, smode in families:
            label = f"{family} {n_steps}"
            print(f"{label}...", flush=True)
            st = gen_mean_pk(
                ddim_slice(n_steps, eta, 300 + n_steps, smode), label
            )
            tp = throughput(lambda s: sample_ddim(
                inf_model, inf_vars, schedule, jax.random.PRNGKey(s),
                n_sample=args.bench_batch, size=64, params=bench_params,
                guide_w=args.guide_w, n_steps=n_steps, eta=eta,
                sigma_mode=smode,
            ))
            add_row(label, n_steps, tp, st.pk, pdf=st.pdf, elbo=st.elbo,
                    bpd=st.bpd, note=f"eta={eta:g}, sigma={smode}")
            print(f"  {tp:.1f} maps/min", flush=True)

    from camels_diffusion_model_tpu.diffusion.dpm_solver import sample_dpm2m

    for n_steps in args.dpm_steps:
        label = f"DPM-Solver++(2M) {n_steps}"
        print(f"{label}...", flush=True)

        def dpm_slice(x0, pp, si, n_steps=n_steps):
            return sample_dpm2m(
                inf_model, inf_vars, schedule, jax.random.PRNGKey(900 + si),
                n_sample=x0.shape[0], size=64, params=pp,
                guide_w=args.guide_w, n_steps=n_steps, x_init=x0,
            ).x

        st = gen_mean_pk(dpm_slice, label)
        tp = throughput(lambda s, n_steps=n_steps: sample_dpm2m(
            inf_model, inf_vars, schedule, jax.random.PRNGKey(s),
            n_sample=args.bench_batch, size=64, params=bench_params,
            guide_w=args.guide_w, n_steps=n_steps,
        ))
        add_row(label, n_steps, tp, st.pk, pdf=st.pdf, elbo=st.elbo,
                bpd=st.bpd, note="2nd-order ODE")
        print(f"  {tp:.1f} maps/min", flush=True)

    from camels_diffusion_model_tpu.diffusion.ddim import hybrid_timesteps

    for spec in args.hybrid:
        t_exact, stride = (int(v) for v in spec.split(":"))
        taus_h = hybrid_timesteps(T, t_exact, stride)
        label = (f"hybrid ancestral exact<={t_exact}, stride {stride} "
                 f"({len(taus_h)} evals)")
        print(f"{label}...", flush=True)

        def hybrid_slice(x0, pp, si, taus_h=taus_h):
            return sample_ddim(
                inf_model, inf_vars, schedule,
                jax.random.PRNGKey(500 + t_exact + si),
                n_sample=x0.shape[0], size=64, params=pp,
                guide_w=args.guide_w, x_init=x0, taus=taus_h,
                sigma_mode="beta",
            ).x

        st = gen_mean_pk(hybrid_slice, label)
        tp = throughput(lambda s, taus_h=taus_h: sample_ddim(
            inf_model, inf_vars, schedule, jax.random.PRNGKey(s),
            n_sample=args.bench_batch, size=64, params=bench_params,
            guide_w=args.guide_w, taus=taus_h, sigma_mode="beta",
        ))
        add_row(label, len(taus_h), tp, st.pk, pdf=st.pdf, elbo=st.elbo,
                bpd=st.bpd, note=f"eta=1, {spec}")
        print(f"  {tp:.1f} maps/min", flush=True)

    # Calibrated rows: a fast sampler + the fixed radial spectral-calibration
    # filter (diffusion/calibration.py), validated OUT-OF-SAMPLE — fresh
    # sampler noise seeds (5000+...), not the seeds the calibration was
    # fitted from — against the same reference protocol.
    # Spec: "steps:npz" (strided DDPM, the default family) or
    # "dpm:steps:npz" (DPM-Solver++(2M) — the 2nd-order ODE sampler's smooth
    # spectral offset is exactly what a radial calibration can remove, at
    # ~5x fewer model evals than the strided valley).
    if args.calibrated:
        import types

        from camels_diffusion_model_tpu.diffusion.calibration import (
            SpectralCalibration,
            apply_spectral_calibration,
            load_calibration_meta,
        )
        from camels_diffusion_model_tpu.diffusion.dpm_solver import (
            sample_dpm2m as _dpm2m,
        )

        for spec in args.calibrated:
            parts = spec.split(":")
            if parts[0] == "dpm":
                c_family, steps_s = "dpm", parts[1]
                calib_path = ":".join(parts[2:])
            else:
                c_family, steps_s = "strided", parts[0]
                calib_path = ":".join(parts[1:])
            c_steps = int(steps_s)
            # Calibrations are model-specific: refuse any npz whose fit-time
            # checkpoint stamp is absent or does not match the checkpoint in
            # use (round-3 failure mode: committed calibrations silently
            # outlived their checkpoint).
            calib_meta = load_calibration_meta(calib_path)
            calib_fp = calib_meta.get("checkpoint_fingerprint")
            if calib_fp is None:
                raise SystemExit(
                    f"calibration {calib_path} carries no "
                    "checkpoint_fingerprint stamp — refit it with "
                    "scripts/fit_calibration.py from a stamped sweep"
                )
            if calib_fp != ckpt_fp:
                raise SystemExit(
                    f"calibration {calib_path} was fitted to checkpoint "
                    f"{calib_fp}, not the one in use ({ckpt_fp}) — re-run "
                    "stage A on this checkpoint and refit"
                )
            calib = SpectralCalibration.load(calib_path)
            fam_name = ("DPM-Solver++(2M)" if c_family == "dpm"
                        else "strided DDPM")
            label = f"{fam_name} {c_steps} + spectral calibration"
            print(f"{label}...", flush=True)

            def raw_sample(key, n, pp, x0=None,
                           c_family=c_family, c_steps=c_steps):
                if c_family == "dpm":
                    return _dpm2m(
                        inf_model, inf_vars, schedule, key, n_sample=n,
                        size=64, params=pp, guide_w=args.guide_w,
                        n_steps=c_steps, x_init=x0,
                    ).x
                return sample_ddim(
                    inf_model, inf_vars, schedule, key, n_sample=n, size=64,
                    params=pp, guide_w=args.guide_w, n_steps=c_steps,
                    eta=1.0, x_init=x0, sigma_mode="beta",
                ).x

            def calib_slice(x0, pp, si, c_steps=c_steps, calib=calib,
                            raw_sample=raw_sample):
                maps = raw_sample(
                    jax.random.PRNGKey(args.cal_seed_base + c_steps + si),
                    x0.shape[0], pp, x0,
                )
                return apply_spectral_calibration(maps, calib)

            # Non-default seed bases are part of the cache identity: the
            # same calibration at a different base is a different map set.
            seed_key = ("" if args.cal_seed_base == 5000
                        else f":s{args.cal_seed_base}")
            st = gen_mean_pk(
                calib_slice, label,
                extra_key=_file_md5(calib_path) + seed_key,
            )

            def calib_bench(s, calib=calib, raw_sample=raw_sample):
                out = raw_sample(
                    jax.random.PRNGKey(s), args.bench_batch, bench_params
                )
                return types.SimpleNamespace(
                    x=apply_spectral_calibration(out, calib)
                )

            tp = throughput(calib_bench)
            add_row(label, c_steps, tp, st.pk, pdf=st.pdf, elbo=st.elbo,
                    bpd=st.bpd,
                    note=f"calibration {os.path.basename(calib_path)} "
                         f"(ckpt {calib_fp[:8]}), fresh-seed validation")
            print(f"  {tp:.1f} maps/min", flush=True)

    # ---- report -------------------------------------------------------------
    md = [
        "| Config | model evals/map | maps/min/chip | max \\|P(k) ratio-1\\| "
        "vs DDPM-1500 | mean vs DDPM-1500 | max vs training data | "
        "mean vs data | pixel-PDF TV vs DDPM-1500 | BPD delta |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        tv = r.get("pdf_tv_vs_ddpm1500")
        db = r.get("bpd_delta_vs_ddpm1500")
        md.append(
            f"| {r['config']} | {r['steps']} | {r['maps_per_min']} | "
            f"{r['max_err_vs_ddpm1500_pct']}% | "
            f"{r['mean_err_vs_ddpm1500_pct']}% | "
            f"{r['max_err_vs_data_pct']}% | {r['mean_err_vs_data_pct']}% | "
            f"{tv if tv is not None else '-'} | "
            f"{f'{db:+.2e}' if db is not None else '-'} |"
        )
    table = "\n".join(md)
    print("\n" + table)
    # A config is certified when it clears the throughput bar AND its
    # spectral deviation from the DDPM reference is within 1% — or within
    # the measured estimator noise floor (the independent-seed DDPM row),
    # below which any difference is statistically indistinguishable from an
    # exact sampler at this N.
    floor_max = floor[0] * 100
    tol = max(1.0, floor_max)
    certified = [
        r for r in rows
        if r["maps_per_min"] is not None and r["maps_per_min"] >= 500
        and r["max_err_vs_ddpm1500_pct"] <= tol
        and "independent seed" not in r["config"]
    ]
    # Full-battery certification: the spectral clause AND the reference's
    # other statistics — pixel-PDF TV within max(floor, 0.01) (1% of the
    # probability mass) and |BPD delta| within max(floor, 1% of the
    # reference BPD magnitude).  Floors come from the independent-seed row,
    # same protocol as the spectrum.
    pdf_tol = max(0.01, pdf_floor_tv) if pdf_floor_tv is not None else None
    bpd_tol = max(0.01 * abs(bpd_ddpm), bpd_floor)
    certified_full = [
        r for r in certified
        if pdf_tol is not None and r.get("pdf_tv_vs_ddpm1500") is not None
        and r["pdf_tv_vs_ddpm1500"] <= pdf_tol
        and r.get("bpd_delta_vs_ddpm1500") is not None
        and abs(r["bpd_delta_vs_ddpm1500"]) <= bpd_tol
    ]
    result = {
        "timesteps": T,
        "scaling": args.scaling,
        "guide_w": args.guide_w,
        "n_eval_maps": n_eval,
        "bench_batch": args.bench_batch,
        "checkpoint_fingerprint": ckpt_fp,
        "device": str(jax.devices()[0]),
        "noise_floor_max_pct": round(floor_max, 2),
        "certify_tolerance_pct": round(tol, 2),
        "k_bins": [float(v) for v in k_bins],
        "pk_ddpm_ref": [float(v) for v in pk_ddpm],
        "pk_data": [float(v) for v in pk_data],
        # Full statistical battery references + floors (pixel-PDF on the
        # fixed grid arange(-3, 3, 0.01); ELBO/BPD paper form, fixed rng).
        "pdf_bin_delta": PDF_DELTA,
        "pdf_bin_range": [float(PDF_BINS[0]), float(PDF_BINS[-1])],
        "pdf_ddpm_ref": [float(v) for v in pdf_ddpm],
        "pdf_data": [float(v) for v in pdf_data],
        "elbo_ddpm_ref": float(elbo_ddpm),
        "bpd_ddpm_ref": float(bpd_ddpm),
        "bpd_data": float(bpd_data),
        "pdf_floor_tv": pdf_floor_tv,
        "bpd_floor_abs": float(bpd_floor),
        "pdf_tolerance_tv": round(pdf_tol, 7) if pdf_tol is not None else None,
        "bpd_tolerance_abs": float(bpd_tol),
        "rows": rows,
        "certified_configs": [r["config"] for r in certified],
        "certified_full_battery": [r["config"] for r in certified_full],
    }
    with open(os.path.join(args.outdir, "certification.json"), "w") as f:
        json.dump(result, f, indent=2)
    with open(os.path.join(args.outdir, "certification.md"), "w") as f:
        f.write(table + "\n")
    print(f"\nestimator noise floor (independent DDPM-{T} run): "
          f"{floor_max:.2f}% max-bin at N={n_eval}; pixel-PDF TV floor "
          f"{pdf_floor_tv}; BPD floor {bpd_floor:.2e}")
    print(f"certified (>=500 maps/min AND max spectral error vs DDPM-{T} "
          f"<= {tol:.2f}%): {result['certified_configs'] or 'NONE'}")
    print(f"certified FULL battery (+ pixel-PDF TV <= {pdf_tol} AND "
          f"|BPD delta| <= {bpd_tol:.2e}): "
          f"{result['certified_full_battery'] or 'NONE'}")


if __name__ == "__main__":
    main()
