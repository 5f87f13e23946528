#!/usr/bin/env python
"""Microbenchmark: does int8 convolution beat bf16 on this TPU at the
ContextUnet's hot shapes?

The v5e MXU advertises 2x int8 throughput vs bf16 (394 TOPS vs 197 TF/s).
Whether XLA actually lowers an int8 `lax.conv_general_dilated` (or an
im2col dot_general) onto the int8 MXU path at our shapes decides whether a
quantized serving path is worth building.  This probe times the sampler's
dominant convs in three forms:

  * bf16 conv (the production path),
  * int8 conv with int32 accumulation (`preferred_element_type`),
  * int8 im2col + dot_general (fallback formulation if conv doesn't lower).

Run AFTER any TPU pipeline finishes (chip is exclusive).  Prints a table;
decision rule: build the quantized path only if int8 wins >=1.4x on the
decoder shapes that dominate the FLOP budget.
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

# The FLOP-dominant convs of the fused-CFG sampler step at serving batch
# 128 (decoder runs at 2x batch): (label, batch, H, W, Cin, Cout).
SHAPES = [
    ("init/down1 64x64 128->128", 128, 64, 64, 128, 128),
    ("down2 32x32 128->256", 128, 32, 32, 128, 256),
    ("up1 16x16 512->128 (2x batch)", 256, 16, 16, 512, 128),
    ("up2 32x32 256->128 (2x batch)", 256, 32, 32, 256, 128),
    ("out 64x64 256->128 (2x batch)", 256, 64, 64, 256, 128),
]
if os.environ.get("INT8_PROBE_SMOKE") == "1":  # CPU smoke: tiny shapes
    SHAPES = [("smoke 8x8 16->16", 2, 8, 8, 16, 16)]
ITERS = int(os.environ.get("INT8_PROBE_ITERS", "20"))

DIMNUMS = lax.conv_dimension_numbers(
    (1, 8, 8, 1), (3, 3, 1, 1), ("NHWC", "HWIO", "NHWC")
)


def timed(fn, *args, iters=ITERS):
    out = fn(*args)
    jax.block_until_ready(out)
    # dependent host read = honest barrier on the tunneled runtime
    _ = float(jnp.abs(jnp.ravel(out)[0]))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.abs(jnp.ravel(out)[0]))
    return (time.time() - t0) / iters


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rows = []
    for label, b, h, w, cin, cout in SHAPES:
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(b, h, w, cin), jnp.bfloat16)
        k = jnp.asarray(rs.randn(3, 3, cin, cout), jnp.bfloat16)
        xq = jnp.asarray(rs.randint(-127, 128, (b, h, w, cin)), jnp.int8)
        kq = jnp.asarray(rs.randint(-127, 128, (3, 3, cin, cout)), jnp.int8)

        @jax.jit
        def conv_bf16(x, k):
            return lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=DIMNUMS
            )

        @jax.jit
        def conv_int8(xq, kq):
            return lax.conv_general_dilated(
                xq, kq, (1, 1), "SAME", dimension_numbers=DIMNUMS,
                preferred_element_type=jnp.int32,
            )

        @jax.jit
        def dot_int8(xq, kq):
            # im2col: 3x3 patches -> (B*H*W, 9*Cin) @ (9*Cin, Cout)
            patches = lax.conv_general_dilated_patches(
                xq.astype(jnp.int8), (3, 3), (1, 1), "SAME",
                dimension_numbers=DIMNUMS,
            )  # (B, H, W, 9*Cin)
            m = patches.reshape(-1, patches.shape[-1])
            kk = kq.transpose(2, 0, 1, 3).reshape(-1, kq.shape[-1])
            return lax.dot_general(
                m, kk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        t_bf16 = timed(conv_bf16, x, k)
        try:
            t_int8 = timed(conv_int8, xq, kq)
        except Exception as e:
            t_int8 = float("nan")
            print(f"  int8 conv failed: {type(e).__name__}: {e}", flush=True)
        try:
            t_dot = timed(dot_int8, xq, kq)
        except Exception as e:
            t_dot = float("nan")
            print(f"  int8 im2col failed: {type(e).__name__}: {e}",
                  flush=True)

        gflop = 2 * b * h * w * 9 * cin * cout / 1e9
        best_int8 = float(np.nanmin([t_int8, t_dot]))
        rows.append((label, t_bf16, best_int8, gflop))
        print(
            f"{label}: bf16 {t_bf16 * 1e3:.3f} ms ({gflop / t_bf16 / 1e3:.1f} TF/s)"
            f" | int8 conv {t_int8 * 1e3:.3f} ms"
            f" | int8 im2col {t_dot * 1e3:.3f} ms"
            f" | best int8 speedup {t_bf16 / best_int8:.2f}x",
            flush=True,
        )

    total_bf16 = sum(r[1] for r in rows)
    total_int8 = sum(r[2] for r in rows)
    print(f"\nTOTAL hot-conv time: bf16 {total_bf16 * 1e3:.2f} ms, "
          f"best-int8 {total_int8 * 1e3:.2f} ms "
          f"-> {total_bf16 / total_int8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
