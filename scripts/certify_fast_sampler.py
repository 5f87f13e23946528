#!/usr/bin/env python
"""Certify a >=500 maps/min/chip sampling configuration with proven spectral
fidelity (the BASELINE.md north star's quality clause).

Exact 1500-step CFG math is FLOP-capped at ~281 maps/min/chip on a v5e
(scripts/flop_audit.py); the certified fast path is a reduced-step DDIM
sampler on the SAME trained checkpoint.  This script:

1. trains the canonical 6-param ContextUnet at T=1500 on a full synthetic LH
   set (or reuses an existing checkpoint with --skip-train);
2. samples N_EVAL maps with the reference-exact 1500-step ancestral DDPM
   sampler (CFG w=2) — the quality reference;
3. samples the SAME x_init/params with DDIM at {50, 100, 250, 500, 750}
   steps (eta=0);
4. computes each config's mean P(k) and the band-max/mean |ratio - 1|
   against (a) the DDPM-1500 output and (b) the training data;
5. measures per-config throughput at the bench batch size;
6. writes a markdown table + JSON (-> SPEEDUP.md, BENCH_r02 context).

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
    ap.add_argument("--eval-maps", type=int, default=256)
    ap.add_argument("--bench-batch", type=int, default=128)
    ap.add_argument("--timesteps", type=int, default=1500)
    ap.add_argument("--ddim-steps", type=int, nargs="*",
                    default=[50, 100, 250, 500, 750])
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
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from camels_diffusion_model_tpu.data import (
        batch_iterator,
        load_camels_dataset,
        synthetic_camels,
    )
    from camels_diffusion_model_tpu.data.pipeline import num_batches
    from camels_diffusion_model_tpu.diffusion import make_schedule, sample_ddpm
    from camels_diffusion_model_tpu.diffusion.ddim import sample_ddim
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

    inf_model, inf_vars = fold_inference(
        model, {"params": state.params, "batch_stats": state.batch_stats}
    )
    schedule = make_schedule(T)

    # ---- quality sampling: same x_init/params for every config -------------
    n_eval = args.eval_maps
    eval_params = jnp.asarray(
        np.tile(ds.test_c, (n_eval // ds.test_c.shape[0] + 1, 1))[:n_eval]
    )
    x_init = jax.random.normal(
        jax.random.PRNGKey(100), (n_eval, 64, 64, 1), jnp.float32
    )

    def mean_pk(maps_bhw):
        k, pk = power_spectrum_batch(np.asarray(maps_bhw, np.float32))
        return np.asarray(k), np.asarray(pk).mean(axis=0)

    print(f"reference: DDPM {T}-step CFG w={args.guide_w}, "
          f"{n_eval} maps...", flush=True)
    t0 = time.time()
    ddpm_out = sample_ddpm(
        inf_model, inf_vars, schedule, jax.random.PRNGKey(200),
        n_sample=n_eval, size=64, params=eval_params, guide_w=args.guide_w,
        x_init=x_init,
    )
    print(f"  done in {time.time() - t0:.1f}s", flush=True)
    k_bins, pk_ddpm = mean_pk(np.asarray(ddpm_out.x)[..., 0])
    _, pk_data = mean_pk(ds.train_x[:n_eval, ..., 0])

    # populated, non-DC bins (the k=0 bin and empty high-k bins are excluded
    # exactly like the reference's "populated bins" logging)
    good = (k_bins > 0) & np.isfinite(pk_ddpm) & (pk_ddpm > 0)

    def spectral_err(pk, ref):
        r = pk[good] / ref[good]
        return float(np.max(np.abs(r - 1.0))), float(np.mean(np.abs(r - 1.0)))

    # ---- throughput helper ---------------------------------------------------
    bench_params = jnp.asarray(
        np.tile(np.asarray(eval_params[:1]), (args.bench_batch, 1))
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
    tp_ddpm = throughput(lambda s: sample_ddpm(
        inf_model, inf_vars, schedule, jax.random.PRNGKey(s),
        n_sample=args.bench_batch, size=64, params=bench_params,
        guide_w=args.guide_w,
    ))
    derr_data = spectral_err(pk_ddpm, pk_data)
    rows.append({
        "config": f"DDPM {T} (reference math)",
        "steps": T,
        "maps_per_min": round(tp_ddpm, 1),
        "max_err_vs_ddpm1500_pct": 0.0,
        "mean_err_vs_ddpm1500_pct": 0.0,
        "max_err_vs_data_pct": round(100 * derr_data[0], 2),
        "mean_err_vs_data_pct": round(100 * derr_data[1], 2),
    })
    print(f"DDPM-{T}: {tp_ddpm:.1f} maps/min", flush=True)

    for n_steps in args.ddim_steps:
        print(f"DDIM {n_steps} steps...", flush=True)
        out = sample_ddim(
            inf_model, inf_vars, schedule, jax.random.PRNGKey(200),
            n_sample=n_eval, size=64, params=eval_params,
            guide_w=args.guide_w, n_steps=n_steps, x_init=x_init,
        )
        _, pk = mean_pk(np.asarray(out.x)[..., 0])
        e_ddpm = spectral_err(pk, pk_ddpm)
        e_data = spectral_err(pk, pk_data)
        tp = throughput(lambda s: sample_ddim(
            inf_model, inf_vars, schedule, jax.random.PRNGKey(s),
            n_sample=args.bench_batch, size=64, params=bench_params,
            guide_w=args.guide_w, n_steps=n_steps,
        ))
        rows.append({
            "config": f"DDIM {n_steps}",
            "steps": n_steps,
            "maps_per_min": round(tp, 1),
            "max_err_vs_ddpm1500_pct": round(100 * e_ddpm[0], 2),
            "mean_err_vs_ddpm1500_pct": round(100 * e_ddpm[1], 2),
            "max_err_vs_data_pct": round(100 * e_data[0], 2),
            "mean_err_vs_data_pct": round(100 * e_data[1], 2),
        })
        print(f"  {tp:.1f} maps/min, max|Pk ratio-1| vs DDPM: "
              f"{100 * e_ddpm[0]:.2f}%", flush=True)

    # ---- report -------------------------------------------------------------
    md = [
        "| Config | model evals/map | maps/min/chip | max \\|P(k) ratio-1\\| "
        "vs DDPM-1500 | mean vs DDPM-1500 | max vs training data | "
        "mean vs data |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        md.append(
            f"| {r['config']} | {r['steps']} | {r['maps_per_min']} | "
            f"{r['max_err_vs_ddpm1500_pct']}% | "
            f"{r['mean_err_vs_ddpm1500_pct']}% | "
            f"{r['max_err_vs_data_pct']}% | {r['mean_err_vs_data_pct']}% |"
        )
    table = "\n".join(md)
    print("\n" + table)
    certified = [
        r for r in rows
        if r["maps_per_min"] >= 500 and r["max_err_vs_ddpm1500_pct"] <= 1.0
    ]
    result = {
        "timesteps": T,
        "scaling": args.scaling,
        "guide_w": args.guide_w,
        "n_eval_maps": n_eval,
        "bench_batch": args.bench_batch,
        "device": str(jax.devices()[0]),
        "rows": rows,
        "certified_configs": [r["config"] for r in certified],
    }
    with open(os.path.join(args.outdir, "certification.json"), "w") as f:
        json.dump(result, f, indent=2)
    with open(os.path.join(args.outdir, "certification.md"), "w") as f:
        f.write(table + "\n")
    print("\ncertified (>=500 maps/min AND <=1% max spectral error vs "
          f"DDPM-{T}): {result['certified_configs'] or 'NONE'}")


if __name__ == "__main__":
    main()
