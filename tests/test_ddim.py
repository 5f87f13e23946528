"""DDIM fast-sampler tests (extension beyond reference parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from camels_diffusion_model_tpu import make_schedule
from camels_diffusion_model_tpu.diffusion.ddim import ddim_timesteps, sample_ddim


def test_ddim_timesteps_subsequence():
    taus = ddim_timesteps(1500, 50)
    assert taus[0] == 1 and taus[-1] == 1500
    assert len(taus) == 50
    assert np.all(np.diff(taus) > 0)
    full = ddim_timesteps(10, 100)
    np.testing.assert_array_equal(full, np.arange(1, 11))


def test_hybrid_timesteps_structure():
    from camels_diffusion_model_tpu.diffusion.ddim import hybrid_timesteps

    taus = hybrid_timesteps(1500, 300, 8)
    assert taus[0] == 1 and taus[-1] == 1500
    assert np.all(np.diff(taus) > 0)
    # every step covered up to t_exact, coarse stride above
    np.testing.assert_array_equal(taus[:300], np.arange(1, 301))
    assert len(taus) == 300 + int(np.ceil((1500 - 300) / 8))
    assert np.all(np.diff(taus[300:]) >= 8) or taus[-1] == 1500
    with pytest.raises(ValueError):
        hybrid_timesteps(100, 0, 4)


def test_ddim_custom_taus(tiny_model_and_vars):
    """Explicit taus= reproduces the equivalent n_steps run and rejects
    malformed schedules."""
    from camels_diffusion_model_tpu.diffusion.ddim import (
        ddim_timesteps as _dts,
    )

    model, variables = tiny_model_and_vars
    sched = make_schedule(20)
    params = np.random.RandomState(0).rand(2, 3).astype(np.float32)
    x_init = np.random.RandomState(1).randn(2, 16, 16, 1).astype(np.float32)
    a = sample_ddim(
        model, variables, sched, jax.random.PRNGKey(0), params=params,
        n_steps=5, eta=0.0, x_init=jnp.asarray(x_init),
    )
    b = sample_ddim(
        model, variables, sched, jax.random.PRNGKey(0), params=params,
        taus=_dts(20, 5), eta=0.0, x_init=jnp.asarray(x_init),
    )
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x), atol=1e-6)
    for bad in ([5, 3, 1], [0, 10], [1, 25], [7]):
        with pytest.raises(ValueError):
            sample_ddim(
                model, variables, sched, jax.random.PRNGKey(0),
                params=params, taus=np.asarray(bad), x_init=jnp.asarray(x_init),
            )


def test_ddim_per_sample_w_length_validated(tiny_model_and_vars):
    """Wrong-length per-sample guide_w raises immediately (not an opaque XLA
    broadcast error later) — same contract as sample_ddpm."""
    model, variables = tiny_model_and_vars
    sched = make_schedule(10)
    params = np.random.RandomState(0).rand(4, 3).astype(np.float32)
    with pytest.raises(ValueError):
        sample_ddim(
            model, variables, sched, jax.random.PRNGKey(0), n_sample=4,
            size=16, params=params, guide_w=np.array([1.0, 2.0]), n_steps=4,
        )


def test_strided_ddpm_full_taus_equals_sample_ddpm(tiny_model_and_vars):
    """sigma_mode="beta" with taus=1..T is the reference ancestral chain: it
    must reproduce sample_ddpm under the same key (same z stream and key
    chain).  At stride 1 the composite alpha ab_t/ab_{t-1} equals a_t only to
    fp32 rounding (~1e-7 relative), which the chained UNet amplifies — so the
    tolerance is loose-but-tiny rather than bitwise; the per-step math is
    identical by construction."""
    from camels_diffusion_model_tpu import sample_ddpm

    model, variables = tiny_model_and_vars
    T = 12
    sched = make_schedule(T)
    params = np.random.RandomState(0).rand(2, 3).astype(np.float32)
    x_init = np.random.RandomState(1).randn(2, 16, 16, 1).astype(np.float32)
    want = sample_ddpm(
        model, variables, sched, jax.random.PRNGKey(5), n_sample=2, size=16,
        params=params, guide_w=2.0, x_init=jnp.asarray(x_init),
    )
    got = sample_ddim(
        model, variables, sched, jax.random.PRNGKey(5), params=params,
        guide_w=2.0, x_init=jnp.asarray(x_init),
        taus=np.arange(1, T + 1), sigma_mode="beta",
    )
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(want.x), atol=0.02
    )
    with pytest.raises(ValueError):
        sample_ddim(
            model, variables, sched, jax.random.PRNGKey(5), params=params,
            x_init=jnp.asarray(x_init), sigma_mode="bogus",
        )


def test_ddim_runs_and_is_deterministic_at_eta0(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    sched = make_schedule(40)
    params = np.random.RandomState(0).rand(2, 3).astype(np.float32)
    x_init = np.random.RandomState(1).randn(2, 16, 16, 1).astype(np.float32)
    a = sample_ddim(
        model, variables, sched, jax.random.PRNGKey(0), params=params,
        n_steps=8, eta=0.0, x_init=jnp.asarray(x_init),
    )
    # different rng, same x_init -> identical at eta=0 (no stochastic term)
    b = sample_ddim(
        model, variables, sched, jax.random.PRNGKey(99), params=params,
        n_steps=8, eta=0.0, x_init=jnp.asarray(x_init),
    )
    assert np.all(np.isfinite(np.asarray(a.x)))
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x), atol=1e-6)


def test_ddim_eta1_stochastic(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    sched = make_schedule(40)
    params = np.random.RandomState(0).rand(2, 3).astype(np.float32)
    x_init = np.random.RandomState(1).randn(2, 16, 16, 1).astype(np.float32)
    a = sample_ddim(
        model, variables, sched, jax.random.PRNGKey(0), params=params,
        n_steps=8, eta=1.0, x_init=jnp.asarray(x_init),
    )
    b = sample_ddim(
        model, variables, sched, jax.random.PRNGKey(99), params=params,
        n_steps=8, eta=1.0, x_init=jnp.asarray(x_init),
    )
    assert not np.allclose(np.asarray(a.x), np.asarray(b.x))


def test_ddim_with_cfg(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    sched = make_schedule(20)
    params = np.random.RandomState(0).rand(2, 3).astype(np.float32)
    out = sample_ddim(
        model, variables, sched, jax.random.PRNGKey(0),
        n_sample=2, size=16, params=params, guide_w=2.0, n_steps=5,
    )
    assert np.all(np.isfinite(np.asarray(out.x)))
