#!/usr/bin/env python
"""Benchmark: 6-param CFG sampling throughput of the flagship model.

Headline metric (BASELINE.md): 64x64 maps/minute/chip at 1500-step
classifier-free-guidance sampling.  The reference (PyTorch, 1 GPU) reaches
~33 maps/min WITHOUT guidance (45.77 s for 25 grid maps, committed log
graphs/.../timing_and_performance.log); guidance doubles its model evals.
``vs_baseline`` is measured against that 33 maps/min number.

TPU path under test: jitted lax.scan sampler, fused CFG (encoder once +
doubled-batch decoder), bfloat16 compute, batch-amortized across the chip.

Env overrides: BENCH_BATCH, BENCH_TIMESTEPS, BENCH_GUIDE_W, BENCH_DTYPE.
Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from camels_diffusion_model_tpu.diffusion import make_schedule, sample_ddpm
    from camels_diffusion_model_tpu.models import ContextUnet

    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"
    batch = int(os.environ.get("BENCH_BATCH", 128 if on_accel else 4))
    timesteps = int(os.environ.get("BENCH_TIMESTEPS", 1500 if on_accel else 20))
    guide_w = float(os.environ.get("BENCH_GUIDE_W", 2.0))
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16" if on_accel else "float32")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    model = ContextUnet(
        in_channels=1, n_feat=128, n_cfeat=6, height=64, levels=2, dtype=dtype
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 64, 64, 1), np.float32),
        np.array([0.5], np.float32),
    )
    schedule = make_schedule(timesteps)
    params = jnp.asarray(
        np.random.RandomState(0).rand(batch, 6).astype(np.float32)
    )

    def run(seed):
        return sample_ddpm(
            model,
            variables,
            schedule,
            jax.random.PRNGKey(seed),
            n_sample=batch,
            size=64,
            params=params,
            guide_w=guide_w,
        )

    def force(x):
        # The experimental TPU tunnel platform can return early from
        # block_until_ready; a dependent-scalar host transfer is the honest
        # completion barrier.
        return float(jnp.abs(x).sum())

    # Warm-up (compile)
    t0 = time.time()
    force(run(0).x)
    compile_and_first = time.time() - t0

    # Timed runs
    times = []
    for seed in (1, 2, 3):
        t0 = time.time()
        out = run(seed)
        force(out.x)
        times.append(time.time() - t0)
    best = min(times)
    maps_per_min = batch / best * 60.0

    baseline_maps_per_min = 33.0  # reference grid sampling, no CFG
    result = {
        "metric": "cfg_sampling_throughput_64x64_t%d" % timesteps,
        "value": round(maps_per_min, 2),
        "unit": "maps/min/chip",
        "vs_baseline": round(maps_per_min / baseline_maps_per_min, 3),
        "batch": batch,
        "guide_w": guide_w,
        "dtype": dtype_name,
        "platform": platform,
        "seconds_per_run": round(best, 3),
        "first_call_seconds": round(compile_and_first, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
