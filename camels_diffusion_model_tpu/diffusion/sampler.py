"""Reverse-diffusion samplers as a single jitted ``lax.scan`` (TPU-native).

Capability parity with the reference's samplers
(``sample_ddpm`` train_diffusion_paper.py:555-623, ``sample_ddpm_from_noise``
:625-686, ancestral step ``denoise_add_noise`` :548-553), re-designed for TPU:

* The entire T-step loop is ONE compiled ``lax.scan`` resident in HBM — the
  reference runs a Python loop with a host sync every step.
* Classifier-free guidance exploits the ContextUnet structure: the encoder
  (init_conv/down path/bottleneck) does not depend on t or c, so it runs once
  per step; only the FiLM-conditioned decoder runs on a doubled batch
  [cond, uncond].  The reference runs the FULL model twice per step
  (train_diffusion_paper.py:600-606).  ~27% fewer FLOPs at identical math.
* The unconditional CFG branch uses a zero context vector, matching
  ``uncond_params = zeros_like(params)`` (train_diffusion_paper.py:587).
* Intermediate states are captured on-device into a preallocated buffer at the
  reference's save schedule (``i % save_rate == 0 or i == T or i < 8``,
  train_diffusion_paper.py:617) — only the ~82 saved frames ever cross to the
  host.
* Semantics note (matches the reference exactly): with ``guide_w == 0`` the
  model is called once with the conditional context (NOT the unconditional
  branch); ``z = 0`` at the final step ``t == 1``.

Images are NHWC: (batch, size, size, channels).
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import DDPMSchedule, p_sample_step


class SamplerOutput(NamedTuple):
    x: jax.Array  # final samples, (B, H, W, C)
    intermediate: jax.Array  # saved states, (n_saves, B, H, W, C)
    sampling_time: float  # wall-clock seconds (host-measured)
    timestep_times: np.ndarray  # per-step seconds (uniform: total / T)


def _save_schedule(timesteps: int, save_rate: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Static save mask over the reversed step sequence i = T..1 and the slot
    each saved step writes to (chronological order, like the reference's
    ``intermediate.append``)."""
    steps = np.arange(timesteps, 0, -1)
    mask = (steps % save_rate == 0) | (steps == timesteps) | (steps < 8)
    slots = np.cumsum(mask) - 1
    return mask.astype(np.bool_), slots.astype(np.int32), int(mask.sum())


def _predict_eps(model, variables, x, t_norm, params, use_cfg: bool, guide_w):
    """One denoiser evaluation, optionally with fused classifier-free guidance."""
    if not use_cfg:
        return model.apply(variables, x, t_norm, params)
    enc = model.apply(variables, x, method="encode")
    enc2 = jax.tree_util.tree_map(
        lambda a: jnp.concatenate([a, a], axis=0), enc
    )
    c2 = jnp.concatenate([params, jnp.zeros_like(params)], axis=0)
    eps2 = model.apply(variables, enc2, t_norm, c2, method="decode")
    eps_cond, eps_uncond = jnp.split(eps2, 2, axis=0)
    return eps_uncond + guide_w * (eps_cond - eps_uncond)


@functools.partial(
    jax.jit,
    static_argnames=("model", "use_cfg", "n_saves"),
)
def _sample_scan(
    model,
    variables,
    schedule_beta,
    schedule_alpha,
    schedule_alpha_bar,
    x_init,
    params,
    guide_w,
    rng,
    steps,
    save_mask,
    save_slots,
    *,
    use_cfg: bool,
    n_saves: int,
):
    timesteps = steps.shape[0]
    sched = DDPMSchedule(
        beta=schedule_beta,
        alpha=schedule_alpha,
        alpha_bar=schedule_alpha_bar,
        timesteps=timesteps,
    )
    buf = jnp.zeros((n_saves,) + x_init.shape, x_init.dtype)

    def body(carry, xs):
        x, buffer, key = carry
        i, save, slot = xs
        key, zkey = jax.random.split(key)
        z = jax.random.normal(zkey, x.shape, x.dtype)
        z = jnp.where(i > 1, z, jnp.zeros_like(z))
        t_norm = (i / timesteps).astype(jnp.float32).reshape(1)
        eps = _predict_eps(model, variables, x, t_norm, params, use_cfg, guide_w)
        x = p_sample_step(sched, x, i, eps.astype(x.dtype), z)
        updated = jax.lax.dynamic_update_slice(
            buffer, x[None], (slot,) + (0,) * x.ndim
        )
        buffer = jnp.where(save, updated, buffer)
        return (x, buffer, key), None

    (x, buf, _), _ = jax.lax.scan(body, (x_init, buf, rng), (steps, save_mask, save_slots))
    return x, buf


def sample_ddpm(
    model,
    variables,
    schedule: DDPMSchedule,
    rng: jax.Array,
    n_sample: int = 1,
    size: int = 64,
    params: Optional[jax.Array] = None,
    guide_w: float = 0.0,
    save_rate: int = 20,
    x_init: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> SamplerOutput:
    """Generate samples by ancestral DDPM sampling from pure noise.

    Matches ``sample_ddpm`` (train_diffusion_paper.py:555-623): if ``params``
    is None a random parameter vector per sample is drawn (uniform [0,1)).
    """
    rng, xkey, pkey = jax.random.split(rng, 3)
    if x_init is None:
        x_init = jax.random.normal(
            xkey, (n_sample, size, size, model.in_channels), dtype
        )
    if params is None:
        params = jax.random.uniform(pkey, (n_sample, model.n_cfeat), jnp.float32)
    return _run(model, variables, schedule, rng, x_init, params, guide_w, save_rate)


def sample_ddpm_from_noise(
    model,
    variables,
    schedule: DDPMSchedule,
    rng: jax.Array,
    noise_images: jax.Array,
    params: Optional[jax.Array] = None,
    guide_w: float = 0.0,
    save_rate: int = 20,
) -> SamplerOutput:
    """Reverse diffusion seeded with forward-diffused real images
    (train_diffusion_paper.py:625-686).  ``params=None`` means zero context."""
    if params is None:
        # Reference passes c=None through the model, which becomes a zero
        # context vector; guidance is disabled in that case (:663-672).
        params = jnp.zeros((noise_images.shape[0], model.n_cfeat), jnp.float32)
        guide_w = 0.0
    return _run(
        model, variables, schedule, rng, noise_images, params, guide_w, save_rate
    )


def _run(model, variables, schedule, rng, x_init, params, guide_w, save_rate):
    timesteps = schedule.timesteps
    mask, slots, n_saves = _save_schedule(timesteps, save_rate)
    steps = jnp.arange(timesteps, 0, -1, dtype=jnp.int32)
    use_cfg = float(guide_w) > 0.0

    t0 = time.time()
    x, buf = _sample_scan(
        model,
        variables,
        schedule.beta,
        schedule.alpha,
        schedule.alpha_bar,
        x_init,
        params,
        jnp.float32(guide_w),
        rng,
        steps,
        jnp.asarray(mask),
        jnp.asarray(slots),
        use_cfg=use_cfg,
        n_saves=n_saves,
    )
    x = jax.block_until_ready(x)
    total = time.time() - t0
    per_step = np.full((timesteps,), total / timesteps, np.float64)
    return SamplerOutput(
        x=x, intermediate=buf, sampling_time=total, timestep_times=per_step
    )
