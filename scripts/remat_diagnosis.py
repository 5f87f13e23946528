#!/usr/bin/env python
"""Diagnose the remat modes of make_train_step at the compiler level.

Round-3 verdict finding: ``remat='convs'`` (save only tensors tagged
``blocks.saveable``, recompute norm/activation epilogues) measured a 25x
SLOWDOWN on the v5e instead of its predicted HBM-roofline win.  This script
pins down why from the compiled program itself, backend-independently:

  for each remat mode in {off, convs, full}:
    - compile the exact production train step (make_train_step) and read
      XLA's cost analysis (total FLOPs, bytes accessed);
    - count convolution/dot ops in the optimized HLO (a recompute explosion
      shows up as duplicated conv ops in the backward);
    - report peak-memory analysis where the backend exposes it.

Usage:  python scripts/remat_diagnosis.py [--batch 32] [--nfeat 128] [--tpu]
        (CPU by default so it can run alongside a TPU job.)
"""

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--nfeat", type=int, default=128)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--timesteps", type=int, default=1500)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default backend (TPU) instead of CPU")
    ap.add_argument("--dump-hlo", default=None,
                    help="directory to write per-mode optimized HLO text")
    ap.add_argument("--measure", action="store_true",
                    help="also time the step (min of 3x10 iterations)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from camels_diffusion_model_tpu.models import ContextUnet
    from camels_diffusion_model_tpu.training import (
        create_train_state,
        make_train_step,
    )

    dtype = jnp.bfloat16 if args.tpu else jnp.float32
    model = ContextUnet(
        in_channels=1, n_feat=args.nfeat, n_cfeat=6, height=args.height,
        levels=2, dtype=dtype,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, args.height, args.height, 1), np.float32),
        np.array([0.5], np.float32),
    )
    x = jnp.asarray(
        np.random.RandomState(0)
        .rand(args.batch, args.height, args.height, 1)
        .astype(np.float32)
    )
    c = jnp.asarray(
        np.random.RandomState(1).rand(args.batch, 6).astype(np.float32)
    )
    rng = jax.random.PRNGKey(2)

    print(f"backend: {jax.devices()[0].platform}, batch {args.batch}, "
          f"n_feat {args.nfeat}, dtype {dtype.__name__}")
    header = (f"{'mode':>6} | {'GFLOPs':>9} | {'GB moved':>9} | "
              f"{'conv ops':>8} | {'dot ops':>7} | {'fusions':>7} | "
              f"{'barriers':>8} | {'imgs/s':>8}")
    print(header)
    print("-" * len(header))
    results = {}
    for mode in (False, "convs", True):
        # donate=False so repeated compiles here don't fight over buffers
        step = make_train_step(model, args.timesteps, remat=mode)
        state = create_train_state(model, variables, 1e-4, 100, 422)
        lowered = step.lower(state, x, c, rng)
        compiled = lowered.compile()
        ca_list = compiled.cost_analysis()
        ca = ca_list[0] if isinstance(ca_list, (list, tuple)) else ca_list
        flops = float(ca.get("flops", float("nan")))
        byt = float(ca.get("bytes accessed", float("nan")))
        hlo = compiled.as_text()
        n_conv = len(re.findall(r" = \S+ convolution\(", hlo))
        n_dot = len(re.findall(r" = \S+ dot\(", hlo))
        n_fus = len(re.findall(r" = \S+ fusion\(", hlo))
        n_bar = len(re.findall(r"opt-barrier|optimization-barrier", hlo))
        imgs_s = float("nan")
        if args.measure:
            import jax.numpy as jnp2

            st = state
            st, m = step(st, x, c, rng)  # warm (already compiled)
            _ = float(m["loss"])
            best = float("inf")
            for _rep in range(3):
                t0 = time.time()
                for i in range(10):
                    st, m = step(st, x, c, jax.random.fold_in(rng, i))
                _ = float(m["loss"])
                best = min(best, (time.time() - t0) / 10)
            imgs_s = args.batch / best
        name = {False: "off", "convs": "convs", True: "full"}[mode]
        results[name] = dict(flops=flops, bytes=byt, conv=n_conv, dot=n_dot,
                             barriers=n_bar, imgs_s=imgs_s)
        print(f"{name:>6} | {flops/1e9:9.2f} | {byt/1e9:9.2f} | "
              f"{n_conv:8d} | {n_dot:7d} | {n_fus:7d} | {n_bar:8d} | "
              f"{imgs_s:8.1f}")
        if args.dump_hlo:
            os.makedirs(args.dump_hlo, exist_ok=True)
            with open(os.path.join(args.dump_hlo, f"train_{name}.hlo"),
                      "w") as f:
                f.write(hlo)

    off = results["off"]
    for name in ("convs", "full"):
        r = results[name]
        print(f"\n{name} vs off: flops x{r['flops']/off['flops']:.2f}, "
              f"bytes x{r['bytes']/off['bytes']:.2f}, "
              f"convs {off['conv']} -> {r['conv']}, "
              f"dots {off['dot']} -> {r['dot']}")


if __name__ == "__main__":
    main()
