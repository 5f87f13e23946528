"""DDIM fast sampler — a TPU-serving extension beyond reference parity.

The reference only has 1500-step ancestral DDPM sampling.  For production
serving, DDIM (Song et al. 2020) samples with a strided timestep subsequence
and deterministic (eta=0) or partially stochastic updates, cutting model
evaluations ~30x at small quality cost.  Math (using the same ``alpha_bar``
schedule as training):

    x0_hat  = (x_t - sqrt(1 - ab_t) * eps) / sqrt(ab_t)
    sigma_t = eta * sqrt((1 - ab_prev) / (1 - ab_t)) * sqrt(1 - ab_t / ab_prev)
    x_prev  = sqrt(ab_prev) * x0_hat
              + sqrt(1 - ab_prev - sigma_t^2) * eps + sigma_t * z

Shares the framework's sampler machinery: one jitted ``lax.scan`` over the
subsequence, fused CFG (encoder once / decoder twice), per-sample or scalar
guidance weights.  NOT used by the reference-parity CLIs.
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .sampler import (
    DEFAULT_STEPS_PER_CALL,
    _SCAN_UNROLL,
    SamplerOutput,
    _film_tables,
    _predict_eps_film,
)
from .schedule import DDPMSchedule


def ddim_timesteps(timesteps: int, n_steps: int) -> np.ndarray:
    """Strided subsequence tau_1 < ... < tau_n of [1, T] (endpoints included)."""
    taus = np.unique(np.linspace(1, timesteps, min(n_steps, timesteps)).round())
    return taus.astype(np.int32)


def hybrid_timesteps(timesteps: int, t_exact: int, stride: int) -> np.ndarray:
    """Hybrid schedule: coarse stride for t > t_exact, EVERY step for
    t <= t_exact.

    Discretization error of reduced-step sampling is concentrated at small t
    (high SNR), where the map's high-k structure crystallizes — large jumps
    there leave a spectral mismatch, while the large-t dynamics are smooth
    and tolerate big strides.  With eta=1 this is a hybrid strided/full
    ancestral sampler: it stays in the same SDE family as the reference's
    1500-step loop and is per-step EXACT over the final t_exact steps.
    Cost: t_exact + ceil((T - t_exact)/stride) model evaluations per map.
    """
    if not 0 < t_exact <= timesteps:
        raise ValueError(f"t_exact must be in (0, {timesteps}]")
    coarse = np.arange(t_exact + stride, timesteps + 1, stride, dtype=np.int64)
    taus = np.concatenate([np.arange(1, t_exact + 1), coarse, [timesteps]])
    return np.unique(taus).astype(np.int32)


@functools.partial(
    jax.jit,
    static_argnames=("model", "use_cfg", "sigma_mode"),
    donate_argnums=(3,),  # x — carried across chunk calls in-place
)
def _ddim_scan(
    model, variables, alpha_bar, x, cemb1, cemb2, temb1_tab, temb2_tab,
    guide_w, rng, taus, taus_prev, eta, *, use_cfg: bool,
    sigma_mode: str = "posterior"
):
    def body(carry, ts):
        x, key = carry
        t, t_prev = ts
        key, zkey, skey = jax.random.split(key, 3)
        ab_t = alpha_bar[t]
        ab_prev = alpha_bar[t_prev]
        eps = _predict_eps_film(
            model, variables, x,
            (cemb1, cemb2),
            (temb1_tab[t][None], temb2_tab[t][None]),
            use_cfg, guide_w, shortcut_key=skey,
        )
        eps = eps.astype(x.dtype)
        z = jax.random.normal(zkey, x.shape, x.dtype)
        if sigma_mode == "beta":
            # Strided DDPM: the reference ancestral update
            # (train_diffusion_paper.py:548-553) with the COMPOSITE alpha of
            # the jump, A = ab_t/ab_prev (product of a over the skipped
            # steps) and sigma^2 = 1 - A (composite beta).  At stride 1 this
            # is bit-identical to sample_ddpm's p_sample step.  The
            # "posterior" (beta-tilde) mode below is a DIFFERENT stochastic
            # process for an imperfect model — the reference chain injects
            # beta-variance noise, not posterior-variance noise, and their
            # outputs differ by a step-count-independent P(k) gap (measured
            # ~25-35%); certifying against the reference chain requires
            # striding the reference's own variance choice.
            a_jump = ab_t / ab_prev
            mean = (
                x - eps * (1.0 - a_jump) * jax.lax.rsqrt(1.0 - ab_t)
            ) * jax.lax.rsqrt(a_jump)
            sigma = jnp.sqrt(jnp.clip(1.0 - a_jump, 0.0, None))
            sigma = jnp.where(t_prev > 0, sigma, 0.0)
            x = mean + sigma * z
        else:
            x0_hat = (x - jnp.sqrt(1.0 - ab_t) * eps) * jax.lax.rsqrt(ab_t)
            sigma = (
                eta
                * jnp.sqrt((1.0 - ab_prev) / (1.0 - ab_t))
                * jnp.sqrt(1.0 - ab_t / ab_prev)
            )
            sigma = jnp.where(t_prev > 0, sigma, 0.0)
            dir_x = jnp.sqrt(jnp.maximum(1.0 - ab_prev - sigma**2, 0.0)) * eps
            x = jnp.sqrt(ab_prev) * x0_hat + dir_x + sigma * z
        return (x, key), None

    (x, key), _ = jax.lax.scan(
        body, (x, rng), (taus, taus_prev), unroll=_SCAN_UNROLL
    )
    return x, key


def sample_ddim(
    model,
    variables,
    schedule: DDPMSchedule,
    rng: jax.Array,
    n_sample: int = 1,
    size: int = 64,
    params: Optional[jax.Array] = None,
    guide_w=0.0,
    n_steps: int = 50,
    eta: float = 0.0,
    x_init: Optional[jax.Array] = None,
    dtype=jnp.float32,
    mesh=None,
    taus: Optional[np.ndarray] = None,
    sigma_mode: str = "posterior",
) -> SamplerOutput:
    """Fast strided sampling.  ``eta=0`` is fully deterministic given x_init.

    ``mesh``: optional ``jax.sharding.Mesh`` — the batch axis is sharded over
    the mesh's data axis (embarrassingly parallel serving sweeps over ICI,
    same semantics as ``sample_ddpm``; the batch is padded to an even shard).

    ``taus``: optional explicit increasing timestep subsequence in [1, T]
    (e.g. :func:`hybrid_timesteps`); overrides ``n_steps``.

    ``sigma_mode``: ``"posterior"`` (DDIM family: eta scales the posterior
    beta-tilde variance; eta=0 deterministic, eta=1 the DDIM ancestral
    variant) or ``"beta"`` (**strided DDPM**: the reference chain's update
    with the composite alpha of each jump — at ``taus=1..T`` it is
    bit-identical to :func:`sample_ddpm`; ``eta`` is ignored).  For an
    imperfect model the two are different stochastic processes; use "beta"
    when the target is matching the reference's ancestral output.
    """
    if sigma_mode not in ("posterior", "beta"):
        raise ValueError(f"unknown sigma_mode: {sigma_mode!r}")
    rng, xkey, pkey = jax.random.split(rng, 3)
    if x_init is None:
        x_init = jax.random.normal(
            xkey, (n_sample, size, size, model.in_channels), dtype
        )
    if params is None:
        params = jax.random.uniform(pkey, (n_sample, model.n_cfeat), jnp.float32)
    if taus is None:
        taus = ddim_timesteps(schedule.timesteps, n_steps)
    else:
        taus = np.asarray(taus, np.int32)
        if taus.ndim != 1 or len(taus) < 2 or np.any(np.diff(taus) <= 0) or (
            taus[0] < 1 or taus[-1] > schedule.timesteps
        ):
            raise ValueError(
                "taus must be a strictly increasing subsequence of "
                f"[1, {schedule.timesteps}]"
            )
    taus = taus[::-1].copy()  # T..1
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
    # Copy, don't alias: the chunked scan donates its x carry; a no-copy
    # asarray of a caller-provided device x_init would delete the caller's
    # array on the first chunk call.
    x = jnp.array(x_init)
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
    # Execute in bounded chunks like sample_ddpm: long monolithic device
    # calls (>~60 s) can fault tunneled/preemptible TPU runtimes.  Chunks
    # dispatch back-to-back on the donated carry; one host sync at the end.
    # First chunk takes the remainder so at most two shapes compile.
    n_taus = len(taus)
    chunk = min(n_taus, DEFAULT_STEPS_PER_CALL)
    n_chunks = -(-n_taus // chunk)
    first = n_taus - (n_chunks - 1) * chunk
    key = rng
    start = 0
    for ci in range(n_chunks):
        size = first if ci == 0 else chunk
        x, key = _ddim_scan(
            model,
            variables,
            schedule.alpha_bar,
            x,
            cemb1,
            cemb2,
            temb1_tab,
            temb2_tab,
            w,
            key,
            jnp.asarray(taus[start:start + size]),
            jnp.asarray(taus_prev[start:start + size]),
            jnp.float32(eta),
            use_cfg=use_cfg,
            sigma_mode=sigma_mode,
        )
        start += size
    jax.block_until_ready(x)
    _ = float(x.reshape(-1)[0])
    total = time.time() - t0
    x = x[:n_real]
    per_step = np.full((len(taus),), total / len(taus), np.float64)
    empty = jnp.zeros((0,) + x.shape, x.dtype)
    return SamplerOutput(
        x=x, intermediate=empty, sampling_time=total, timestep_times=per_step
    )
