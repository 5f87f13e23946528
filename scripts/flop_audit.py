#!/usr/bin/env python
"""FLOP audit: derive the sampling speed-of-light from the model config.

Answers, with arithmetic that can be checked by hand, the question "how fast
CAN 1500-step CFG sampling of the canonical ContextUnet go on one chip?":

1. Analytic conv-FLOP count per model evaluation (every conv layer listed).
2. The fused-CFG step cost: encoder once + decoder on a doubled batch.
3. Speed-of-light maps/min/chip at the device's peak bf16 throughput.
4. Cross-check against XLA's own cost analysis of the jitted step.

Usage: python scripts/flop_audit.py [--timesteps 1500] [--batch 128]
Env: CAMELS_PEAK_TFLOPS overrides the peak (defaults by device kind).

The audited ceiling is recorded in BASELINE.md / ARCHITECTURE.md; bench.py
measures the achieved fraction.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Peak dense bf16 matmul throughput per chip (public figures).
PEAK_TFLOPS_BY_KIND = {
    "TPU v5 lite": 197.0,  # v5e: 197 TF/s bf16
    "TPU v5e": 197.0,
    "TPU v5": 459.0,  # v5p
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,  # v6e (Trillium)
}


def conv_flops(h, w, cin, cout, k):
    """Multiply-add FLOPs (2*MACs) of a same-resolution k x k conv."""
    return 2.0 * h * w * cin * cout * k * k


def canonical_forward_flops(height=64, n_feat=128, in_channels=1, detail=None):
    """Per-sample FLOPs of ONE canonical ContextUnet evaluation (levels=2).

    Layer structure mirrors models/context_unet.py (reference:
    train_diffusion_paper.py:16-70).  Embedding MLPs are excluded: the sampler
    hoists them out of the scan (diffusion/sampler.py::_film_tables) and their
    cost is O(n_feat^2) once per run, not per step.
    """
    n = n_feat
    rows = []

    def add(name, f):
        rows.append((name, f))
        return f

    h = height
    total = 0.0
    # init_conv: ResidualConvBlock(in->n, is_res, learned 1x1 shortcut)
    total += add("init_conv.conv1", conv_flops(h, h, in_channels, n, 3))
    total += add("init_conv.conv2", conv_flops(h, h, n, n, 3))
    total += add("init_conv.shortcut", conv_flops(h, h, in_channels, n, 1))
    # down1: 4 convs n->n at full res, then pool
    for blk in ("block1", "block2"):
        total += add(f"down1.{blk}.conv1", conv_flops(h, h, n, n, 3))
        total += add(f"down1.{blk}.conv2", conv_flops(h, h, n, n, 3))
    h2 = h // 2
    # down2: n->2n at h/2
    total += add("down2.block1.conv1", conv_flops(h2, h2, n, 2 * n, 3))
    total += add("down2.block1.conv2", conv_flops(h2, h2, 2 * n, 2 * n, 3))
    total += add("down2.block2.conv1", conv_flops(h2, h2, 2 * n, 2 * n, 3))
    total += add("down2.block2.conv2", conv_flops(h2, h2, 2 * n, 2 * n, 3))
    h4 = h // 4
    # up0: ConvTranspose(2n->2n, k=s=h4) from 1x1 to h4 x h4
    total += add("up0_conv", 2.0 * h4 * h4 * 2 * n * 2 * n)
    # up1: UnetUp(4n->n): convT k2s2 from h4 -> h2, then 4 convs n->n at h2
    total += add("up1.upconv", 2.0 * h4 * h4 * 4 * 4 * n * n)
    for blk in ("block1", "block2"):
        total += add(f"up1.{blk}.conv1", conv_flops(h2, h2, n, n, 3))
        total += add(f"up1.{blk}.conv2", conv_flops(h2, h2, n, n, 3))
    # up2: UnetUp(2n->n): convT from h2 -> h, then 4 convs n->n at h
    total += add("up2.upconv", 2.0 * h2 * h2 * 4 * 2 * n * n)
    for blk in ("block1", "block2"):
        total += add(f"up2.{blk}.conv1", conv_flops(h, h, n, n, 3))
        total += add(f"up2.{blk}.conv2", conv_flops(h, h, n, n, 3))
    # out head: Conv(2n->n) then Conv(n->in)
    total += add("out_conv1", conv_flops(h, h, 2 * n, n, 3))
    total += add("out_conv2", conv_flops(h, h, n, in_channels, 3))
    if detail is not None:
        detail.extend(rows)
    return total


def encoder_decoder_split(height=64, n_feat=128, in_channels=1):
    """(encoder_flops, decoder_flops) per sample.  Encoder = init_conv + down
    path (condition-independent, runs ONCE per CFG step); decoder = up path +
    out head (runs on the doubled [cond, uncond] batch)."""
    detail = []
    canonical_forward_flops(height, n_feat, in_channels, detail)
    enc = sum(f for name, f in detail if name.startswith(("init_conv", "down")))
    dec = sum(f for name, f in detail if not name.startswith(("init_conv", "down")))
    return enc, dec


def xla_cost_check(batch=8):
    """Cross-check: XLA's own cost analysis of one full forward."""
    import jax
    import jax.numpy as jnp

    from camels_diffusion_model_tpu.models import ContextUnet

    model = ContextUnet(n_feat=128, n_cfeat=6, height=64, levels=2,
                        dtype=jnp.bfloat16)
    x = np.zeros((batch, 64, 64, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, np.array([0.5], np.float32))

    def fwd(v, x):
        return model.apply(v, x, np.array([0.5], np.float32),
                           np.zeros((batch, 6), np.float32))

    compiled = jax.jit(fwd).lower(variables, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", float("nan"))) / batch


def train_step_audit(batch, timesteps, measure=False, scaling="reference",
                     n_timed_steps=20, remat=False):
    """Speed-of-light audit of ONE jitted training step (fwd + bwd + Adam).

    Analytic floor: a conv's backward costs ~2x its forward (grad-input +
    grad-weight convs), so a train step is ~3x forward FLOPs.  The authoritative
    number is XLA's cost analysis of the ACTUAL compiled step (includes BN
    statistics, Adam, and any rematerialization).  With ``measure=True`` the
    step is also timed on the device twice: once with device-resident input
    (pure step cost) and once feeding fresh numpy arrays each step (the
    production host->device path), so the input-pipeline overhead is isolated.
    """
    import time

    import jax
    import jax.numpy as jnp

    from camels_diffusion_model_tpu.models import ContextUnet
    from camels_diffusion_model_tpu.training import (
        create_train_state,
        make_train_step,
    )

    model = ContextUnet(n_feat=128, n_cfeat=6, height=64, levels=2,
                        dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 1), np.float32),
        np.array([0.5], np.float32),
    )
    state = create_train_state(model, variables, 1e-4, 100, 422)
    step = make_train_step(model, timesteps, scaling=scaling, donate=True,
                           remat=remat)

    rs = np.random.RandomState(0)
    x_np = rs.rand(batch, 64, 64, 1).astype(np.float32)
    c_np = rs.rand(batch, 6).astype(np.float32)
    key = jax.random.PRNGKey(1)

    lowered = step.lower(state, jnp.asarray(x_np), jnp.asarray(c_np), key)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    nbytes = float(ca.get("bytes accessed", float("nan")))
    out = {
        "batch": batch,
        "xla_train_step_gf": flops / 1e9,
        "xla_train_step_gf_per_img": flops / batch / 1e9,
        "xla_bytes_accessed_gb": nbytes / 1e9,
    }
    if not measure:
        return out

    def timed(feed_host):
        nonlocal state
        st = state
        x_dev, c_dev = jnp.asarray(x_np), jnp.asarray(c_np)
        k = key
        for _ in range(3):  # warm-up (compile + donation steady-state)
            k, sub = jax.random.split(k)
            st, m = step(st, x_dev, c_dev, sub)
            if feed_host:
                x_dev, c_dev = jnp.asarray(x_np), jnp.asarray(c_np)
        _ = float(m["loss"])  # dependent host read = barrier
        t0 = time.time()
        for _ in range(n_timed_steps):
            k, sub = jax.random.split(k)
            if feed_host:
                # fresh numpy each step -> genuine H2D on the hot path
                # (.copy(): ascontiguousarray on an already-contiguous
                # array is an identity and would reuse one buffer)
                x_dev = x_np.copy()
                c_dev = c_np.copy()
            st, m = step(st, x_dev, c_dev, sub)
        _ = float(m["loss"])
        dt = time.time() - t0
        state = st
        return batch * n_timed_steps / dt

    out["imgs_per_sec_device_input"] = timed(False)
    out["imgs_per_sec_host_input"] = timed(True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timesteps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--n-feat", type=int, default=128)
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="audit the training step instead of sampling")
    ap.add_argument("--train-batches", type=int, nargs="*",
                    default=[32, 256])
    ap.add_argument("--measure", action="store_true",
                    help="also time the train step on the device")
    ap.add_argument("--scaling", choices=["reference", "standard"],
                    default="reference")
    # jax.checkpoint the forward (recompute in backward): trades FLOPs for
    # HBM traffic — the winning direction when the step is memory-bound.
    # "full" saves nothing; "convs" saves only conv outputs and recomputes
    # the BatchNorm/activation epilogues (trainer.py remat="convs").
    ap.add_argument("--remat", nargs="?", const="full",
                    choices=["full", "convs"], default=None)
    args = ap.parse_args()

    if args.train:
        train_main(args)
        return

    detail = []
    per_eval = canonical_forward_flops(args.height, args.n_feat, 1, detail)
    enc, dec = encoder_decoder_split(args.height, args.n_feat, 1)

    print(f"Canonical ContextUnet ({args.height}x{args.height}, n_feat={args.n_feat}):")
    for name, f in detail:
        print(f"  {name:24s} {f / 1e9:8.3f} GF")
    print(f"  {'TOTAL per evaluation':24s} {per_eval / 1e9:8.3f} GF")
    print(f"  encoder (runs 1x/step)   {enc / 1e9:8.3f} GF")
    print(f"  decoder (runs 2x/step)   {dec / 1e9:8.3f} GF")

    cfg_step = enc + 2 * dec
    per_map = cfg_step * args.timesteps
    print(f"\nFused-CFG step cost: {cfg_step / 1e9:.3f} GF/map/step")
    print(f"Per-map total at T={args.timesteps}: {per_map / 1e12:.2f} TF")

    peak_tf = os.environ.get("CAMELS_PEAK_TFLOPS")
    kind = "unknown"
    if peak_tf is None:
        try:
            import jax

            kind = jax.devices()[0].device_kind
        except Exception:
            pass
        peak_tf = PEAK_TFLOPS_BY_KIND.get(kind, 197.0)
    peak_tf = float(peak_tf)
    sol_maps_min = peak_tf * 1e12 / per_map * 60.0
    print(f"\nDevice kind: {kind}; peak bf16: {peak_tf:.0f} TF/s")
    print(f"Speed of light: {sol_maps_min:.1f} maps/min/chip "
          f"(exact {args.timesteps}-step CFG math)")
    print("NOTE: the >=500 maps/min north star is NOT reachable at exact "
          f"{args.timesteps}-step math on one chip; the certified fast path "
          "is a reduced-step sampler with proven spectral fidelity "
          "(see SPEEDUP.md).")

    result = {
        "per_eval_gf": per_eval / 1e9,
        "encoder_gf": enc / 1e9,
        "decoder_gf": dec / 1e9,
        "cfg_step_gf": cfg_step / 1e9,
        "per_map_tf": per_map / 1e12,
        "peak_tflops": peak_tf,
        "sol_maps_per_min": sol_maps_min,
        "timesteps": args.timesteps,
    }
    if not args.skip_xla:
        try:
            xla_per_eval = xla_cost_check()
            result["xla_per_eval_gf"] = xla_per_eval / 1e9
            print(f"\nXLA cost-analysis cross-check: {xla_per_eval / 1e9:.3f} "
                  f"GF per evaluation (analytic: {per_eval / 1e9:.3f} GF)")
        except Exception as e:  # cost analysis availability varies by backend
            print(f"\nXLA cost-analysis unavailable: {type(e).__name__}: {e}")
    print("\n" + json.dumps(result))


def train_main(args):
    import jax

    fwd = canonical_forward_flops(args.height, args.n_feat, 1)
    analytic_step = 3.0 * fwd  # fwd + ~2x fwd for conv backward
    print(f"Analytic: forward {fwd / 1e9:.3f} GF/img, "
          f"train step ~3x = {analytic_step / 1e9:.3f} GF/img")

    peak_tf = os.environ.get("CAMELS_PEAK_TFLOPS")
    kind = "unknown"
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        pass
    if peak_tf is None:
        peak_tf = PEAK_TFLOPS_BY_KIND.get(kind, 197.0)
    peak_tf = float(peak_tf)

    results = []
    for b in args.train_batches:
        from camels_diffusion_model_tpu.training import parse_remat_env

        r = train_step_audit(
            b, args.timesteps, measure=args.measure, scaling=args.scaling,
            remat=parse_remat_env(args.remat),
        )
        gf_img = r["xla_train_step_gf_per_img"]
        r["analytic_gf_per_img"] = analytic_step / 1e9
        r["sol_imgs_per_sec"] = peak_tf * 1e12 / (gf_img * 1e9)
        # Arithmetic intensity of the whole compiled step: below the device's
        # ridge point (~#peak_flops/HBM_BW ~ 240 F/B on v5e) the step is
        # HBM-bound, not MXU-bound.
        r["flops_per_byte"] = (
            r["xla_train_step_gf"] / r["xla_bytes_accessed_gb"]
        )
        print(f"batch {b}: XLA {gf_img:.2f} GF/img "
              f"({r['xla_train_step_gf']:.1f} GF/step, "
              f"{r['xla_bytes_accessed_gb']:.2f} GB accessed, "
              f"{r['flops_per_byte']:.0f} F/B), "
              f"SOL {r['sol_imgs_per_sec']:.0f} imgs/s at {peak_tf:.0f} TF/s")
        if args.measure:
            dev = r["imgs_per_sec_device_input"]
            host = r["imgs_per_sec_host_input"]
            r["pct_of_sol_device_input"] = 100.0 * dev / r["sol_imgs_per_sec"]
            print(f"  measured: {dev:.0f} imgs/s device-input "
                  f"({r['pct_of_sol_device_input']:.0f}% of SOL), "
                  f"{host:.0f} imgs/s host-input "
                  f"(input pipeline costs {100 * (1 - host / dev):.0f}%)")
        results.append(r)
    print("\n" + json.dumps({"device_kind": kind, "peak_tflops": peak_tf,
                             "rows": results}))


if __name__ == "__main__":
    main()
