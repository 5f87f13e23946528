"""DPM-Solver++(2M) — second-order multistep ODE sampler (serving extension).

A TPU-serving extension beyond reference parity (the reference only has the
1500-step ancestral loop, train_diffusion_paper.py:555-623).  DPM-Solver++
(Lu et al., 2022, arXiv:2211.01095) integrates the probability-flow ODE in
log-SNR time with a second-order linear multistep rule on the *data
prediction* x0 = (x - sigma*eps)/alpha, converging to the same deterministic
limit as DDIM (eta=0) in roughly an order of magnitude fewer model
evaluations.

Math (eps-prediction model, this framework's cosine-free linear-beta
schedule): with alpha_t = sqrt(ab_t), sigma_t = sqrt(1 - ab_t),
lambda_t = log(alpha_t / sigma_t), stepping the subsequence
tau_n > ... > tau_1 (decreasing t, increasing lambda):

    h_i   = lambda_i - lambda_{i-1}
    r_i   = h_{i-1} / h_i
    D_i   = (1 + 1/(2 r_i)) * x0_i - 1/(2 r_i) * x0_{i-1}   (first step: x0_i)
    x_i   = (sigma_i / sigma_{i-1}) * x_{i-1} - alpha_i * (exp(-h_i) - 1) * D_i

The final update to t=0 (sigma=0) returns the current data prediction.

Shares the sampler machinery: one jitted ``lax.scan`` over the subsequence,
precomputed FiLM tables, fused CFG (encoder once / decoder twice), optional
mesh sharding of the batch.  Deterministic given x_init.
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ddim import ddim_timesteps
from .sampler import SamplerOutput, _film_tables, _predict_eps_film
from .schedule import DDPMSchedule


@functools.partial(jax.jit, static_argnames=("model", "use_cfg"))
def _dpm2m_scan(
    model, variables, alpha_bar, x, cemb1, cemb2, temb1_tab, temb2_tab,
    guide_w, rng, taus, taus_prev, *, use_cfg: bool
):
    def x0_pred(x, t, skey):
        eps = _predict_eps_film(
            model, variables, x,
            (cemb1, cemb2),
            (temb1_tab[t][None], temb2_tab[t][None]),
            use_cfg, guide_w, shortcut_key=skey,
        ).astype(x.dtype)
        ab = alpha_bar[t]
        return (x - jnp.sqrt(1.0 - ab) * eps) * jax.lax.rsqrt(ab)

    def lam(t):
        ab = alpha_bar[t]
        return 0.5 * (jnp.log(ab) - jnp.log1p(-ab))

    def body(carry, ts):
        x, prev_x0, prev_h, first, key = carry
        t, t_prev = ts
        # Per-step shortcut stream: models with the reference-faithful
        # stochastic init_conv shortcut draw a fresh projection each forward
        # (like _ddim_scan / _sample_scan_chunk); learned-shortcut models
        # ignore the key entirely, keeping the ODE solve deterministic.
        key, skey = jax.random.split(key)
        x0 = x0_pred(x, t, skey)
        l_t = lam(t)
        # guard the t_prev == 0 final jump (lambda -> inf there); its branch
        # result is discarded by the where() below
        l_prev = lam(jnp.maximum(t_prev, 1))
        h = l_prev - l_t
        r = prev_h / h
        d_second = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * prev_x0
        d = jnp.where(first, x0, d_second)
        ab_p = alpha_bar[jnp.maximum(t_prev, 1)]
        sig_ratio = jnp.sqrt((1.0 - ab_p) / (1.0 - alpha_bar[t]))
        x_reg = sig_ratio * x - jnp.sqrt(ab_p) * jnp.expm1(-h) * d
        # final jump to sigma=0: the ODE solution collapses onto the data
        # prediction
        x_new = jnp.where(t_prev > 0, x_reg, x0)
        h_carry = jnp.where(t_prev > 0, h, prev_h)
        return (x_new, x0, h_carry, jnp.zeros_like(first), key), None

    first = jnp.ones((), jnp.bool_)
    (x, _, _, _, _), _ = jax.lax.scan(
        body, (x, jnp.zeros_like(x), jnp.ones((), x.dtype), first, rng),
        (taus, taus_prev),
    )
    return x


def sample_dpm2m(
    model,
    variables,
    schedule: DDPMSchedule,
    rng: jax.Array,
    n_sample: int = 1,
    size: int = 64,
    params: Optional[jax.Array] = None,
    guide_w=0.0,
    n_steps: int = 25,
    x_init: Optional[jax.Array] = None,
    dtype=jnp.float32,
    mesh=None,
) -> SamplerOutput:
    """DPM-Solver++(2M) sampling over a strided subsequence of [1, T].

    Deterministic given ``x_init`` (for ``shortcut='stochastic'`` models, given
    ``x_init`` and ``rng`` — the per-forward shortcut draws consume a key
    stream); ``mesh`` shards the batch over the data axis like the other
    samplers."""
    rng, xkey, pkey = jax.random.split(rng, 3)
    if x_init is None:
        x_init = jax.random.normal(
            xkey, (n_sample, size, size, model.in_channels), dtype
        )
    if params is None:
        params = jax.random.uniform(pkey, (n_sample, model.n_cfeat), jnp.float32)
    taus = ddim_timesteps(schedule.timesteps, n_steps)[::-1].copy()  # T..1
    taus_prev = np.concatenate([taus[1:], np.zeros(1, np.int32)])
    w_arr = np.asarray(guide_w, np.float64)
    use_cfg = bool(np.any(w_arr > 0.0))
    if w_arr.ndim > 0 and use_cfg and np.any(w_arr <= 0.0):
        raise ValueError(
            "per-sample guide_w must be all-positive (w=0 uses a different "
            "single-forward semantics in the reference; run it separately)"
        )
    n_real = int(np.shape(x_init)[0])
    if w_arr.ndim > 0 and w_arr.shape[0] != n_real:
        raise ValueError(
            f"per-sample guide_w length {w_arr.shape[0]} must match the "
            f"batch size {n_real}"
        )
    x = jnp.asarray(x_init)
    params = jnp.asarray(params)
    w = jnp.asarray(guide_w, jnp.float32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        pad = (-n_real) % n_dev
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
            params = jnp.concatenate(
                [params, jnp.zeros((pad,) + params.shape[1:], params.dtype)]
            )
            if w.ndim > 0:
                w = jnp.concatenate([w, jnp.ones((pad,), w.dtype)])
        bspec = lambda ndim: NamedSharding(
            mesh, P(mesh.axis_names[0], *([None] * (ndim - 1)))
        )
        x = jax.device_put(x, bspec(x.ndim))
        params = jax.device_put(params, bspec(params.ndim))
        if w.ndim > 0:
            w = jax.device_put(w, NamedSharding(mesh, P(mesh.axis_names[0])))
    cemb1, cemb2, temb1_tab, temb2_tab = _film_tables(
        model, variables, params, schedule.timesteps, use_cfg
    )

    t0 = time.time()
    x = _dpm2m_scan(
        model,
        variables,
        schedule.alpha_bar,
        x,
        cemb1,
        cemb2,
        temb1_tab,
        temb2_tab,
        w,
        rng,
        jnp.asarray(taus),
        jnp.asarray(taus_prev),
        use_cfg=use_cfg,
    )
    jax.block_until_ready(x)
    _ = float(x.reshape(-1)[0])
    total = time.time() - t0
    x = x[:n_real]
    per_step = np.full((len(taus),), total / len(taus), np.float64)
    empty = jnp.zeros((0,) + x.shape, x.dtype)
    return SamplerOutput(
        x=x, intermediate=empty, sampling_time=total, timestep_times=per_step
    )
