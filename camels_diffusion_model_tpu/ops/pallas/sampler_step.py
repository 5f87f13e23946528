"""Fused ancestral-update kernel for the reverse-diffusion step.

One VMEM pass computing (reference denoise_add_noise,
train_diffusion_paper.py:548-553):

    mean = (x - eps * (1 - a_t) / sqrt(1 - ab_t)) / sqrt(a_t)
    out  = mean + sqrt(b_t) * z

The three schedule gathers collapse to two precomputed scalars
(``c_eps = (1-a)/sqrt(1-ab)``, ``inv_sqrt_a = 1/sqrt(a)``, ``sqrt_b``)
held in SMEM, so the kernel reads x/eps/z once and writes once — the minimal
HBM traffic for this op.  Pure-XLA fallback: diffusion.schedule.p_sample_step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _step_kernel(coef_ref, x_ref, eps_ref, z_ref, out_ref):
    c_eps = coef_ref[0, 0]
    inv_sqrt_a = coef_ref[0, 1]
    sqrt_b = coef_ref[0, 2]
    mean = (x_ref[:] - eps_ref[:] * c_eps) * inv_sqrt_a
    out_ref[:] = mean + sqrt_b * z_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_p_sample_step(schedule_beta, schedule_alpha, schedule_alpha_bar,
                        x, t, eps, z, interpret: bool = False):
    """Fused p_sample step at scalar integer timestep ``t``.

    x/eps/z: (B, H, W, C) with B*H*W*C a multiple of 128.
    """
    a = schedule_alpha[t]
    ab = schedule_alpha_bar[t]
    b = schedule_beta[t]
    coefs = jnp.stack(
        [
            (1.0 - a) * jax.lax.rsqrt(1.0 - ab),
            jax.lax.rsqrt(a),
            jnp.sqrt(b),
        ]
    ).reshape(1, 3).astype(jnp.float32)

    shape = x.shape
    n = x.size
    lanes = 128
    rows = n // lanes
    assert rows * lanes == n, f"size {n} not a multiple of 128"
    x2 = x.reshape(rows, lanes)
    eps2 = eps.reshape(rows, lanes).astype(x.dtype)
    z2 = z.reshape(rows, lanes).astype(x.dtype)

    out = pl.pallas_call(
        _step_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, lanes), x.dtype),
        in_specs=[
            pl.BlockSpec((1, 3), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coefs, x2, eps2, z2)
    return out.reshape(shape)
