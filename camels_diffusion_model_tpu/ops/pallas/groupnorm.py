"""Fused GroupNorm + affine + activation kernel (NHWC).

The ContextUnet's decoder/out heads use GroupNorm(8) followed by an
activation (train_diffusion_paper.py:34-47).  This kernel computes the
per-(sample, group) statistics, normalization, affine, and activation in one
VMEM-resident pass over a batch row: x is read once from HBM and the result
written once.  Statistics accumulate in float32 regardless of the IO dtype.

Mosaic-friendly formulation: reshaping the lane (channel) dimension into
(groups, ch/group) is not supported on TPU, so group statistics are computed
with a static channel->group one-hot membership matrix M (C, G):

    sum_g  = colsum(x)  @ M          # (1, G)
    sumsq_g= colsum(x*x)@ M          # (1, G)
    mean_c = mean_g @ M^T            # broadcast back to channels
    var    = E[x^2] - E[x]^2

which keeps everything in (sublane, lane) layout and puts the tiny
reductions on the MXU.  Pure-XLA fallback: flax ``nn.GroupNorm`` + act.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(num_groups: int, cg: int, eps: float, act: str):
    def kernel(x_ref, gamma_ref, beta_ref, m_ref, out_ref):
        x = x_ref[0].astype(jnp.float32)  # (HW, C)
        hw = x.shape[0]
        m = m_ref[:]  # (C, G)
        n = float(hw * cg)
        col = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
        colsq = jnp.sum(x * x, axis=0, keepdims=True)
        sum_g = jnp.dot(col, m, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # (1, G)
        sumsq_g = jnp.dot(colsq, m, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        mean_g = sum_g / n
        var_g = sumsq_g / n - mean_g * mean_g
        rstd_g = jax.lax.rsqrt(var_g + eps)
        mean_c = jnp.dot(mean_g, m.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # (1, C)
        rstd_c = jnp.dot(rstd_g, m.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        y = (x - mean_c) * rstd_c * gamma_ref[:] + beta_ref[:]
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        elif act == "gelu":
            y = jax.nn.gelu(y, approximate=False)
        elif act == "leaky_relu":
            y = jnp.where(y > 0, y, 0.2 * y)
        elif act != "none":
            raise ValueError(act)
        out_ref[0] = y.astype(out_ref.dtype)

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
    assert c % num_groups == 0
    cg = c // num_groups
    x2 = x.reshape(b, h * w, c)
    gamma2 = gamma.reshape(1, c).astype(jnp.float32)
    beta2 = beta.reshape(1, c).astype(jnp.float32)
    membership = np.zeros((c, num_groups), np.float32)
    for g in range(num_groups):
        membership[g * cg : (g + 1) * cg, g] = 1.0
    m = jnp.asarray(membership)

    out = pl.pallas_call(
        _make_kernel(num_groups, cg, eps, act),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x2, gamma2, beta2, m)
    return out.reshape(b, h, w, c)
