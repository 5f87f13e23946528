#!/usr/bin/env python
"""Attribute the exact-CFG sampler's gap to its FLOP speed-of-light.

bench.py measures ~244 maps/min at batch 128 vs the 281 maps/min audited
ceiling (scripts/flop_audit.py) — ~87%.  This script times an ablation
ladder of the production scan body (the film fast path of
diffusion/sampler.py::_sample_scan_chunk) with one component removed at a
time, attributing the residue WITHOUT needing a TensorBoard trace over the
tunneled runtime:

  full          production body (forward + CFG combine + threefry z +
                ancestral update + buffer write)
  pregen_noise  z for the whole chunk drawn in ONE normal() outside the
                scan, fed as scan xs (identical math & stream count —
                candidate production optimization, not just an ablation)
  no_noise      z = 0 constant (removes threefry entirely)
  no_buf        no intermediate-buffer dynamic_update_slice
  no_update     ancestral update replaced by x = eps (keeps the sequential
                dependency; isolates pure forward + combine)

Each variant runs one compiled 250-step chunk (the production chunk size),
timed over repeated calls.  Also sweeps batch sizes on the full body.

Usage: python scripts/sampler_residue.py [--batch 128] [--chunk 250]
                                         [--batches 96 128 160 192]
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--timesteps", type=int, default=1500)
    ap.add_argument("--guide-w", type=float, default=2.0)
    ap.add_argument("--batches", type=int, nargs="*", default=[])
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from camels_diffusion_model_tpu.diffusion import make_schedule
    from camels_diffusion_model_tpu.diffusion.sampler import (
        _film_tables,
        _predict_eps_film,
        _save_schedule,
    )
    from camels_diffusion_model_tpu.diffusion.schedule import (
        DDPMSchedule,
        p_sample_step,
    )
    from camels_diffusion_model_tpu.models import ContextUnet
    from camels_diffusion_model_tpu.models.fold_bn import fold_inference

    print(f"devices: {jax.devices()}", flush=True)
    T = args.timesteps
    schedule = make_schedule(T)
    model = ContextUnet(in_channels=1, n_feat=128, n_cfeat=6, height=64,
                        levels=2, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 1), np.float32),
        np.array([0.5], np.float32),
    )
    model, variables = fold_inference(model, variables)

    mask, slots, n_saves = _save_schedule(T, 20)
    steps_all = np.arange(T, 0, -1, dtype=np.int32)
    slots_all = np.where(mask, slots, n_saves).astype(np.int32)

    def build_chunk(variant):
        @functools.partial(jax.jit, static_argnames=(), donate_argnums=(0, 1))
        def chunk_fn(x, buf, cemb1, cemb2, temb1_tab, temb2_tab, w, rng,
                     steps, write_slots, zs):
            sched = DDPMSchedule(beta=schedule.beta, alpha=schedule.alpha,
                                 alpha_bar=schedule.alpha_bar, timesteps=T)

            def body(carry, xs):
                x, buffer, key = carry
                if variant == "pregen_noise":
                    i, slot, z = xs
                else:
                    i, slot = xs
                key, zkey, _skey = jax.random.split(key, 3)
                if variant == "no_noise":
                    z = jnp.zeros_like(x)
                elif variant != "pregen_noise":
                    z = jax.random.normal(zkey, x.shape, x.dtype)
                    z = jnp.where(i > 1, z, jnp.zeros_like(z))
                eps = _predict_eps_film(
                    model, variables, x, (cemb1, cemb2),
                    (temb1_tab[i][None], temb2_tab[i][None]), True, w,
                )
                if variant == "no_update":
                    x = eps.astype(x.dtype)
                else:
                    x = p_sample_step(sched, x, i, eps.astype(x.dtype), z)
                    x = x.astype(jnp.float32)
                if variant != "no_buf":
                    buffer = jax.lax.dynamic_update_slice(
                        buffer, x[None], (slot,) + (0,) * x.ndim
                    )
                return (x, buffer, key), None

            if variant == "pregen_noise":
                xs = (steps, write_slots, zs)
            else:
                xs = (steps, write_slots)
            (x, buf, _), _ = jax.lax.scan(body, (x, buf, rng), xs)
            return x, buf

        return chunk_fn

    def time_variant(variant, batch):
        chunk_fn = build_chunk(variant)
        params = jnp.asarray(
            np.random.RandomState(0).rand(batch, 6).astype(np.float32)
        )
        cemb1, cemb2, t1, t2 = _film_tables(model, variables, params, T, True)
        w = jnp.asarray(args.guide_w, jnp.float32)
        steps = jnp.asarray(steps_all[: args.chunk])
        wslots = jnp.asarray(slots_all[: args.chunk])
        rng = jax.random.PRNGKey(5)

        def fresh():
            x = jax.random.normal(jax.random.PRNGKey(1),
                                  (batch, 64, 64, 1), jnp.float32)
            buf = jnp.zeros((n_saves + 1, batch, 64, 64, 1), jnp.float32)
            return jnp.array(x), buf

        def zchunk(key):
            if variant != "pregen_noise":
                return None
            # ONE draw for the whole chunk; final-step zeroing matches the
            # production where(i > 1) semantics.
            z = jax.random.normal(key, (args.chunk, batch, 64, 64, 1),
                                  jnp.float32)
            return z * (steps > 1).astype(z.dtype)[:, None, None, None, None]

        x, buf = fresh()
        x, buf = chunk_fn(x, buf, cemb1, cemb2, t1, t2, w, rng, steps,
                          wslots, zchunk(jax.random.PRNGKey(9)))
        _ = float(jnp.abs(x).sum())  # barrier (tunnel-safe)
        best = float("inf")
        for r in range(args.repeats):
            x, buf = fresh()
            zs = zchunk(jax.random.PRNGKey(10 + r))
            _ = float(jnp.abs(x).sum())
            t0 = time.time()
            x, buf = chunk_fn(x, buf, cemb1, cemb2, t1, t2, w, rng, steps,
                              wslots, zs)
            _ = float(jnp.abs(x).sum())
            best = min(best, time.time() - t0)
        ms_per_step = best / args.chunk * 1e3
        maps_min = batch / (ms_per_step * 1e-3 * T) * 60.0
        return ms_per_step, maps_min

    results = {}
    for variant in ("full", "pregen_noise", "no_noise", "no_buf",
                    "no_update"):
        ms, mpm = time_variant(variant, args.batch)
        results[variant] = {"ms_per_step": round(ms, 3),
                            "maps_per_min_at_T": round(mpm, 1)}
        print(f"{variant:14s} {ms:7.3f} ms/step  -> {mpm:7.1f} maps/min "
              f"@T={T}", flush=True)

    batch_rows = {}
    for b in args.batches:
        ms, mpm = time_variant("full", b)
        batch_rows[b] = {"ms_per_step": round(ms, 3),
                         "maps_per_min_at_T": round(mpm, 1)}
        print(f"batch {b:4d}     {ms:7.3f} ms/step  -> {mpm:7.1f} maps/min",
              flush=True)

    print(json.dumps({"batch": args.batch, "chunk": args.chunk,
                      "guide_w": args.guide_w, "variants": results,
                      "batch_sweep": batch_rows}))


if __name__ == "__main__":
    main()
