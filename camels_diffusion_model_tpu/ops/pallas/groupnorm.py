"""Fused GroupNorm + affine + activation kernel (NHWC).

The ContextUnet's decoder/out heads use GroupNorm(8) followed by an
activation (train_diffusion_paper.py:34-47).  This kernel computes the
per-(sample, group) statistics, normalization, affine, and activation in one
VMEM-resident pass over a batch row: x is read once from HBM and the result
written once, instead of the separate stat-reduction + normalize passes a
non-fused lowering can produce.  Statistics accumulate in float32 regardless
of the IO dtype.  Pure-XLA fallback: flax ``nn.GroupNorm`` + activation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(num_groups: int, eps: float, act: str):
    def kernel(x_ref, gamma_ref, beta_ref, out_ref):
        x = x_ref[:].astype(jnp.float32)  # (1, HW, C)
        hw = x.shape[1]
        c = x.shape[2]
        cg = c // num_groups
        g = x.reshape(hw, num_groups, cg)
        mean = jnp.mean(g, axis=(0, 2), keepdims=True)
        var = jnp.mean(jnp.square(g - mean), axis=(0, 2), keepdims=True)
        norm = (g - mean) * jax.lax.rsqrt(var + eps)
        y = norm.reshape(1, hw, c) * gamma_ref[:] + beta_ref[:]
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        elif act == "gelu":
            y = jax.nn.gelu(y, approximate=False)
        elif act == "leaky_relu":
            y = jnp.where(y > 0, y, 0.2 * y)
        elif act != "none":
            raise ValueError(act)
        out_ref[:] = y.astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "act", "interpret")
)
def fused_groupnorm_act(
    x,
    gamma,
    beta,
    num_groups: int = 8,
    eps: float = 1e-5,
    act: str = "relu",
    interpret: bool = False,
):
    """GroupNorm + affine + activation over NHWC input, one pass per sample.

    gamma/beta: (C,).  Returns same shape/dtype as x.
    """
    b, h, w, c = x.shape
    x2 = x.reshape(b, h * w, c)
    gamma2 = gamma.reshape(1, 1, c).astype(jnp.float32)
    beta2 = beta.reshape(1, 1, c).astype(jnp.float32)

    out = pl.pallas_call(
        _make_kernel(num_groups, eps, act),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x2, gamma2, beta2)
    return out.reshape(b, h, w, c)
