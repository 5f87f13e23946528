"""DDPM noise schedule and single-step forward/reverse kernels (pure JAX).

Reference behavior reproduced (capability parity, not code):

* Schedule: ``b_t = (beta2 - beta1) * linspace(0, 1, T+1) + beta1``;
  ``a_t = 1 - b_t``; ``ab_t = exp(cumsum(log(a_t)))`` with ``ab_t[0] = 1``.
  Arrays have length ``T + 1`` and are indexed ``1..T``
  (reference: code/train_diffusion_paper.py:214-217).
* Forward perturbation (q_sample) exists in TWO variants in the reference:
  the ``code/`` trainers use the non-standard ``sqrt(ab_t)*x + (1-ab_t)*noise``
  (code/train_diffusion_paper.py:320-321) while the root-level ``main.py:156``
  and the ELBO evaluator (code/train_diffusion_paper.py:112) use the standard
  ``sqrt(ab_t)*x + sqrt(1-ab_t)*noise``.  Both are first-class here via
  :class:`NoiseScaling`.
* Reverse ancestral step (p_sample):
  ``mean = (x - eps*(1-a_t)/sqrt(1-ab_t)) / sqrt(a_t)``; ``x <- mean + sqrt(b_t)*z``
  with ``z = 0`` at ``t == 1`` (code/train_diffusion_paper.py:548-553).

Everything is shape-polymorphic in the batch/spatial dims and jit-friendly:
``t`` may be a scalar or a per-sample ``(B,)`` int array.
"""

from __future__ import annotations

import enum
from typing import NamedTuple

import jax
import jax.numpy as jnp


class NoiseScaling(str, enum.Enum):
    """Which q_sample noise scaling to use.

    REFERENCE: ``sqrt(ab_t) * x + (1 - ab_t) * noise`` — the non-standard form
    used by every trainer under the reference's ``code/`` directory.  Metrics
    (NLL) and trained-model statistics depend on it.

    STANDARD: ``sqrt(ab_t) * x + sqrt(1 - ab_t) * noise`` — the textbook DDPM
    form, used by the reference's ELBO evaluator and root-level ``main.py``.
    """

    REFERENCE = "reference"
    STANDARD = "standard"


class DDPMSchedule(NamedTuple):
    """Precomputed linear-beta DDPM schedule, length ``timesteps + 1``.

    Index ``t`` in ``1..timesteps``; index 0 is defined with ``alpha_bar[0]=1``
    so that q_sample at t=0 is the identity.
    """

    beta: jax.Array  # b_t, shape (T+1,)
    alpha: jax.Array  # a_t = 1 - b_t, shape (T+1,)
    alpha_bar: jax.Array  # ab_t = prod(a_1..a_t), shape (T+1,)
    timesteps: int  # static T

    @property
    def sqrt_alpha_bar(self) -> jax.Array:
        return jnp.sqrt(self.alpha_bar)

    @property
    def one_minus_alpha_bar(self) -> jax.Array:
        return 1.0 - self.alpha_bar


def make_schedule(
    timesteps: int,
    beta1: float = 1e-4,
    beta2: float = 0.02,
    dtype: jnp.dtype = jnp.float32,
) -> DDPMSchedule:
    """Build the reference's linear schedule (length ``timesteps + 1``)."""
    if timesteps < 1:
        raise ValueError(f"timesteps must be >= 1, got {timesteps}")
    beta = (beta2 - beta1) * jnp.linspace(0.0, 1.0, timesteps + 1, dtype=dtype) + beta1
    alpha = 1.0 - beta
    # cumsum-of-logs (== cumprod, matches the reference's numerics) then pin
    # alpha_bar[0] = 1 exactly.
    alpha_bar = jnp.exp(jnp.cumsum(jnp.log(alpha)))
    alpha_bar = alpha_bar.at[0].set(1.0)
    return DDPMSchedule(
        beta=beta, alpha=alpha, alpha_bar=alpha_bar, timesteps=int(timesteps)
    )


def _bcast_t(coeff: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather ``coeff[t]`` and right-pad dims so it broadcasts against an
    ``ndim``-dimensional image batch.  ``t`` may be scalar or ``(B,)``."""
    g = coeff[t]
    if g.ndim == 0:
        return g
    return g.reshape(g.shape + (1,) * (ndim - g.ndim))


def q_sample(
    schedule: DDPMSchedule,
    x0: jax.Array,
    t: jax.Array,
    noise: jax.Array,
    scaling: NoiseScaling = NoiseScaling.REFERENCE,
) -> jax.Array:
    """Forward-diffuse ``x0`` to timestep ``t``.

    ``x0``: (..., H, W, C) or any shape; ``t``: scalar or (B,) int in [0, T];
    ``noise``: same shape as ``x0``.
    """
    sab = _bcast_t(schedule.sqrt_alpha_bar, t, x0.ndim)
    omab = _bcast_t(schedule.one_minus_alpha_bar, t, x0.ndim)
    if scaling == NoiseScaling.REFERENCE:
        return sab * x0 + omab * noise
    return sab * x0 + jnp.sqrt(omab) * noise


def p_sample_step(
    schedule: DDPMSchedule,
    x: jax.Array,
    t: jax.Array,
    eps: jax.Array,
    z: jax.Array,
) -> jax.Array:
    """One ancestral reverse step at integer timestep ``t`` (scalar or (B,)).

    The caller is responsible for passing ``z = 0`` at ``t == 1`` (the sampler
    does this with a ``jnp.where`` on the step index so the scan body stays
    branch-free).
    """
    a = _bcast_t(schedule.alpha, t, x.ndim)
    ab = _bcast_t(schedule.alpha_bar, t, x.ndim)
    b = _bcast_t(schedule.beta, t, x.ndim)
    mean = (x - eps * ((1.0 - a) * jax.lax.rsqrt(1.0 - ab))) * jax.lax.rsqrt(a)
    return mean + jnp.sqrt(b) * z


def ddpm_loss(pred_noise: jax.Array, noise: jax.Array) -> jax.Array:
    """Simple epsilon-prediction MSE objective
    (reference: code/train_diffusion_paper.py:361)."""
    return jnp.mean(jnp.square(pred_noise - noise))
