"""ELBO / BPD / NLL evaluation passes (jitted, batched, TPU-native).

Capability parity with the reference's three likelihood formulas — each one is
reproduced exactly, including their mutual inconsistencies:

* ``calculate_elbo_and_bpd`` (train_diffusion_paper.py:77-139): 10 truncated-
  linspace timesteps in [1, T]; **standard** noise scaling
  ``sqrt(ab)x + sqrt(1-ab)n`` (unlike training's q_sample); weight
  ``0.5 * b_t / (1 - ab_t)`` applied only for ``t > 1``; averaged over the 10
  steps; ``bpd = elbo / (H*W * ln 2)``.
* ``calculate_likelihood`` (train_diffusion_paper.py:142-183): full sweep
  ``t = 1..T`` with the **reference** (non-standard) scaling
  ``sqrt(ab)x + (1-ab)n``; ``nll += mse / (2 b_t)``; dataset mean.
  On TPU the T-step sweep is one ``lax.scan`` — the reference's Python loop
  costs ~364 s per eval (its committed logs); this is the second hot loop.
* ``elbo_per_batch`` (train_diffusion_elbo.py:74-105): per-training-batch form
  with weight ``0.5 * (1/(1-ab_t) - 1)`` at the batch's random timesteps.

Host-side wrappers accumulate over an iterable of (x, c) batches, padding the
final partial batch to keep shapes static (no recompiles).
"""

from __future__ import annotations

import functools
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.context_unet import model_rngs
from .schedule import DDPMSchedule


def elbo_timesteps(timesteps: int, n: int = 10) -> np.ndarray:
    """The reference's ``torch.linspace(1, T, n).long()`` — linspace then
    truncation toward zero (train_diffusion_paper.py:107)."""
    ts = np.linspace(1.0, float(timesteps), n)
    ts = np.trunc(ts).astype(np.int32)
    ts[-1] = timesteps
    return ts


def _per_sample_mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    """MSE reduced over all non-batch axes -> (B,)."""
    return jnp.mean(
        jnp.square(pred - target), axis=tuple(range(1, pred.ndim))
    )


@functools.partial(jax.jit, static_argnames=("model",))
def elbo_bpd_batch(
    model,
    variables,
    beta,
    alpha_bar,
    x,
    c,
    rng,
    sampled_t,
):
    """Per-sample ELBO contribution of one batch (paper form).

    ``sampled_t``: (10,) int32 timesteps from :func:`elbo_timesteps`.
    Returns (B,) per-sample elbo.
    """
    timesteps = beta.shape[0] - 1

    def body(acc, t_and_key):
        t, key = t_and_key
        nkey, skey = jax.random.split(key)
        noise = jax.random.normal(nkey, x.shape, x.dtype)
        x_t = jnp.sqrt(alpha_bar[t]) * x + jnp.sqrt(1.0 - alpha_bar[t]) * noise
        t_norm = (t / timesteps).astype(jnp.float32).reshape(1)
        pred = model.apply(variables, x_t, t_norm, c, rngs=model_rngs(model, skey))
        mse = _per_sample_mse(pred, noise)
        weight = jnp.where(t > 1, 0.5 * beta[t] / (1.0 - alpha_bar[t]), 0.0)
        return acc + weight * mse / sampled_t.shape[0], None

    keys = jax.random.split(rng, sampled_t.shape[0])
    acc, _ = jax.lax.scan(
        body, jnp.zeros(x.shape[0], jnp.float32), (sampled_t, keys)
    )
    return acc


@functools.partial(jax.jit, static_argnames=("model", "timesteps", "weighting"))
def _t_sweep_chunk(model, variables, beta, alpha_bar, x, c, acc, rng, ts, *,
                   timesteps: int, weighting: str):
    """One chunk of a t-sweep scan (NLL or full-trajectory ELBO weighting).

    Chunked for the same reason as the sampler: long monolithic device calls
    are fragile on tunneled/preemptible TPU runtimes; the host carries
    (acc, rng) between fixed-size chunk calls of this one compiled function.
    """

    def body(carry, t):
        acc, key = carry
        key, nkey, skey = jax.random.split(key, 3)
        noise = jax.random.normal(nkey, x.shape, x.dtype)
        # Reference (non-standard) scaling: sqrt(ab)x + (1-ab)n  (:166)
        x_t = jnp.sqrt(alpha_bar[t]) * x + (1.0 - alpha_bar[t]) * noise
        t_norm = (t / timesteps).astype(jnp.float32).reshape(1)
        pred = model.apply(variables, x_t, t_norm, c, rngs=model_rngs(model, skey))
        mse = _per_sample_mse(pred, noise)
        if weighting == "nll":
            w = 1.0 / (2.0 * beta[t])  # (:177)
        else:  # full-trajectory ELBO (diffusion_utilities.py:509)
            w = 0.5 * (1.0 / (1.0 - alpha_bar[t]) - 1.0)
        return (acc + w * mse, key), None

    (acc, rng), _ = jax.lax.scan(body, (acc, rng), ts)
    return acc, rng


def _chunked_t_sweep(model, variables, beta, alpha_bar, x, c, rng, weighting):
    timesteps = int(beta.shape[0]) - 1
    from .sampler import DEFAULT_STEPS_PER_CALL

    chunk = min(timesteps, DEFAULT_STEPS_PER_CALL)
    n_chunks = -(-timesteps // chunk)
    first = timesteps - (n_chunks - 1) * chunk
    acc = jnp.zeros(x.shape[0], jnp.float32)
    start = 1
    for ci in range(n_chunks):
        size = first if ci == 0 else chunk
        ts = jnp.arange(start, start + size, dtype=jnp.int32)
        acc, rng = _t_sweep_chunk(
            model, variables, beta, alpha_bar, jnp.asarray(x), jnp.asarray(c),
            acc, rng, ts, timesteps=timesteps, weighting=weighting,
        )
        start += size
    return acc


def nll_batch(model, variables, beta, alpha_bar, x, c, rng):
    """Per-sample NLL of one batch: full t=1..T sweep as chunked ``lax.scan``
    calls (train_diffusion_paper.py:163-178).  Returns (B,)."""
    return _chunked_t_sweep(model, variables, beta, alpha_bar, x, c, rng, "nll")


def elbo_per_batch(
    beta, alpha_bar, mse_per_sample: jax.Array, t: jax.Array, mask=None
) -> jax.Array:
    """Per-batch training-time ELBO (train_diffusion_elbo.py:74-105):
    ``mean(0.5 * (1/(1-ab_t) - 1) * mse)`` at the batch's timesteps.

    ``mask`` (B,) restricts the mean to real rows of a padded partial batch
    (pad rows arrive with ``mse`` already zeroed by the masked train step)."""
    weight = 0.5 * (1.0 / (1.0 - alpha_bar[t]) - 1.0)
    if mask is None:
        return jnp.mean(weight * mse_per_sample)
    m = mask.astype(mse_per_sample.dtype)
    return jnp.sum(weight * mse_per_sample * m) / jnp.sum(m)


def elbo_full_trajectory_batch(model, variables, beta, alpha_bar, x, c, rng):
    """Full-trajectory ELBO over every t=1..T as chunked ``lax.scan`` calls
    (the reference's commented-out evaluation form,
    diffusion_utilities.py:490-518: weight ``0.5*(1/(1-ab_t)-1)``, averaged
    over timesteps).  Returns per-sample elbo (B,)."""
    timesteps = int(beta.shape[0]) - 1
    acc = _chunked_t_sweep(model, variables, beta, alpha_bar, x, c, rng, "elbo")
    return acc / timesteps


def _pad_batch(x: np.ndarray, c: np.ndarray, batch_size: int):
    """Zero-pad a partial batch to ``batch_size``; returns (x, c, n_real)."""
    n = x.shape[0]
    if n == batch_size:
        return x, c, n
    pad = batch_size - n
    x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    c = np.concatenate([c, np.zeros((pad,) + c.shape[1:], c.dtype)], axis=0)
    return x, c, n


def calculate_elbo_and_bpd(
    model,
    variables,
    schedule: DDPMSchedule,
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    rng: jax.Array,
    dims: Optional[int] = None,
    batch_size: Optional[int] = None,
) -> Tuple[float, float]:
    """Dataset-level ELBO and BPD (paper form, train_diffusion_paper.py:77-139).

    ``batches``: iterable of (x NHWC, c) arrays.  ``dims`` defaults to H*W of
    the first batch (the reference hardcodes 64*64 at :136).
    """
    ts = jnp.asarray(elbo_timesteps(schedule.timesteps))
    total = 0.0
    count = 0
    for x, c in batches:
        x = np.asarray(x)
        c = np.asarray(c)
        if dims is None:
            dims = x.shape[1] * x.shape[2]
        bs = batch_size or x.shape[0]
        x_p, c_p, n_real = _pad_batch(x, c, bs)
        rng, key = jax.random.split(rng)
        per_sample = elbo_bpd_batch(
            model, variables, schedule.beta, schedule.alpha_bar,
            jnp.asarray(x_p), jnp.asarray(c_p), key, ts,
        )
        total += float(jnp.sum(per_sample[:n_real]))
        count += n_real
    elbo = total / max(count, 1)
    bpd = elbo / (dims * np.log(2.0))
    return elbo, bpd


def calculate_likelihood(
    model,
    variables,
    schedule: DDPMSchedule,
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    rng: jax.Array,
    batch_size: Optional[int] = None,
) -> float:
    """Dataset-mean negative log likelihood (train_diffusion_paper.py:142-183)."""
    total = 0.0
    count = 0
    for x, c in batches:
        x = np.asarray(x)
        c = np.asarray(c)
        bs = batch_size or x.shape[0]
        x_p, c_p, n_real = _pad_batch(x, c, bs)
        rng, key = jax.random.split(rng)
        per_sample = nll_batch(
            model, variables, schedule.beta, schedule.alpha_bar,
            jnp.asarray(x_p), jnp.asarray(c_p), key,
        )
        total += float(jnp.sum(per_sample[:n_real]))
        count += n_real
    return total / max(count, 1)
