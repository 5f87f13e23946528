#!/usr/bin/env python
"""Pin down the large-batch conv-tiling regression with per-shape evidence.

Measured fact (ARCHITECTURE.md): training runs at 94% of its HBM roofline
at batch 32 but only ~46% of either roofline at batch >= 256, and sampler
batch 256 measures LOWER than 128.  The declared cause — XLA conv tiling at
(>=512, 64, 64, .) shapes past its sweet spot — rested on whole-step A/B
timing only.  This probe isolates it per conv shape:

  1. batch sweep of every FLOP-dominant conv of the model (bf16, NHWC,
     3x3), reporting achieved TF/s and % of the 197 TF/s bf16 peak;
  2. for shapes that regress, two remedies measured in place:
       * "chunked"  — split the batch into 128-image chunks evaluated
         sequentially inside one jitted call (lax.map) — if tiling is the
         problem, chunking restores the batch-128 rate;
       * "im2col"   — the explicit dot_general formulation (MXU-shaped
         matmul, bypasses the conv tiler entirely);
  3. writes a per-shape table (markdown) for the committed perf docs.

Run on the idle chip (exclusive): python scripts/conv_tiling_probe.py
Smoke: CAMELS_FORCE_CPU=1 CONV_PROBE_SMOKE=1 python scripts/conv_tiling_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

if os.environ.get("CAMELS_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

# The model's FLOP-dominant 3x3 convs (label, H, W, Cin, Cout); the batch
# sweep multiplies the serving/training batch in.
SHAPES = [
    ("64x64 128->128", 64, 64, 128, 128),
    ("32x32 128->256", 32, 32, 128, 256),
    ("32x32 256->128", 32, 32, 256, 128),
    ("16x16 512->128", 16, 16, 512, 128),
    ("64x64 256->128", 64, 64, 256, 128),
]
BATCHES = (32, 128, 256, 512)
CHUNK = 128
if os.environ.get("CONV_PROBE_SMOKE") == "1":
    SHAPES = [("8x8 16->16", 8, 8, 16, 16)]
    BATCHES = (2, 4)
    CHUNK = 2
ITERS = int(os.environ.get("CONV_PROBE_ITERS", "30"))
PEAK_TFS = 197.0  # v5e bf16

DN = lax.conv_dimension_numbers(
    (1, 8, 8, 1), (3, 3, 1, 1), ("NHWC", "HWIO", "NHWC")
)


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=jnp.bfloat16,
    )


def conv_chunked(x, w):
    b = x.shape[0]
    if b <= CHUNK:
        return conv(x, w)
    xs = x.reshape(b // CHUNK, CHUNK, *x.shape[1:])
    return lax.map(lambda xc: conv(xc, w), xs).reshape(b, *x.shape[1:-1], -1)


def conv_im2col(x, w):
    b, h, ww, cin = x.shape
    cout = w.shape[-1]
    patches = lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), "SAME", dimension_numbers=DN,
    )  # (B, H, W, Cin*9), feature order matches w.transpose layout
    m = patches.reshape(b * h * ww, cin * 9)
    # conv_general_dilated_patches emits features as (Cin, kh, kw) blocks;
    # reorder the HWIO kernel to match.
    k = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin * 9, cout)
    out = jax.lax.dot_general(
        m, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.bfloat16,
    )
    return out.reshape(b, h, ww, cout)


def bench(fn, x, w):
    f = jax.jit(fn)
    out = f(x, w)
    out.block_until_ready()
    _ = float(jnp.abs(out).sum())  # tunnel-honest barrier
    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(ITERS):
            out = f(x, w)
        _ = float(jnp.abs(out).sum())
        times.append((time.time() - t0) / ITERS)
    return min(times)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    rs = np.random.RandomState(0)
    # Correctness gate: all three formulations must agree (bf16 tolerance)
    # before any timing is trusted — the im2col patch ordering in particular
    # is easy to get silently wrong.
    xc = jnp.asarray(rs.randn(CHUNK * 2, 8, 8, 16).astype(np.float32),
                     jnp.bfloat16)
    wc = jnp.asarray(rs.randn(3, 3, 16, 16).astype(np.float32), jnp.bfloat16)
    ref = np.asarray(conv(xc, wc), np.float32)
    for name, fn in (("chunked", conv_chunked), ("im2col", conv_im2col)):
        got = np.asarray(fn(xc, wc), np.float32)
        err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-6)
        assert err < 3e-2, f"{name} disagrees with direct conv: rel {err:.3g}"
    print("correctness gate passed (chunked, im2col match direct)",
          flush=True)
    rows = ["| conv | batch | direct TF/s (%peak) | chunked | im2col |",
            "|---|---|---|---|---|"]
    for label, h, w_, cin, cout in SHAPES:
        kern = jnp.asarray(
            rs.randn(3, 3, cin, cout).astype(np.float32), jnp.bfloat16
        )
        for b in BATCHES:
            x = jnp.asarray(
                rs.randn(b, h, w_, cin).astype(np.float32), jnp.bfloat16
            )
            gflop = 2.0 * b * h * w_ * cin * cout * 9 / 1e9
            cells = []
            for name, fn in (("direct", conv), ("chunked", conv_chunked),
                             ("im2col", conv_im2col)):
                dt = bench(fn, x, kern)
                tfs = gflop / dt / 1e3
                cells.append(f"{tfs:.1f} ({100 * tfs / PEAK_TFS:.0f}%)")
                print(f"{label} b={b} {name}: {dt * 1e3:.3f} ms, "
                      f"{tfs:.1f} TF/s ({100 * tfs / PEAK_TFS:.0f}% peak)",
                      flush=True)
            rows.append(f"| {label} | {b} | " + " | ".join(cells) + " |")
    table = "\n".join(rows)
    print("\n" + table)
    out_path = os.environ.get(
        "CONV_PROBE_OUT", "/tmp/conv_tiling_probe.md"
    )
    with open(out_path, "w") as f:
        f.write(f"device: {dev}\n\n{table}\n")
    print(f"\nwritten: {out_path}")


if __name__ == "__main__":
    main()
