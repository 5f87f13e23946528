"""Tests: ELBO/BPD/NLL formulas vs closed-form with a stub model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from camels_diffusion_model_tpu import make_schedule
from camels_diffusion_model_tpu.diffusion.likelihood import (
    calculate_elbo_and_bpd,
    calculate_likelihood,
    elbo_per_batch,
    elbo_timesteps,
)


class ZeroModel:
    """Stub denoiser predicting zeros: per-sample MSE == mean(noise**2)."""

    def apply(self, variables, x, t, c, **kw):
        return jnp.zeros_like(x)

    def __hash__(self):
        return hash("ZeroModel")

    def __eq__(self, other):
        return isinstance(other, ZeroModel)


def test_elbo_timesteps_matches_torch_linspace():
    torch = pytest.importorskip("torch")
    for T in (10, 100, 500, 1500):
        want = torch.linspace(1, T, 10).long().numpy()
        got = elbo_timesteps(T)
        np.testing.assert_array_equal(got, want)


def test_nll_zero_model_closed_form():
    """With eps_hat = 0, E[mse_t] = E[mean(noise^2)] = 1, so
    E[NLL] = sum_t 1/(2 b_t).  4096-dim means tight concentration."""
    T = 50
    sched = make_schedule(T)
    x = np.zeros((4, 16, 16, 1), np.float32)
    c = np.zeros((4, 2), np.float32)
    nll = calculate_likelihood(
        ZeroModel(), {}, sched, [(x, c)], jax.random.PRNGKey(0)
    )
    beta = np.asarray(sched.beta)
    want = np.sum(1.0 / (2.0 * beta[1 : T + 1]))
    assert abs(nll - want) / want < 0.05


def test_elbo_zero_model_closed_form():
    """With eps_hat = 0, E[elbo] = mean over 10 sampled t of
    0.5*b_t/(1-ab_t) for t>1 (weight zero at t==1)."""
    T = 40
    sched = make_schedule(T)
    x = np.zeros((4, 16, 16, 1), np.float32)
    c = np.zeros((4, 2), np.float32)
    elbo, bpd = calculate_elbo_and_bpd(
        ZeroModel(), {}, sched, [(x, c)], jax.random.PRNGKey(0), dims=16 * 16
    )
    beta = np.asarray(sched.beta)
    ab = np.asarray(sched.alpha_bar)
    ts = elbo_timesteps(T)
    want = sum(
        0.5 * beta[t] / (1 - ab[t]) for t in ts if t > 1
    ) / len(ts)
    assert abs(elbo - want) / want < 0.05
    np.testing.assert_allclose(bpd, elbo / (256 * np.log(2)), rtol=1e-6)


def test_partial_batch_padding_consistent():
    """Padded partial batches must not change the dataset mean."""
    T = 20
    sched = make_schedule(T)
    rs = np.random.RandomState(0)
    x = rs.randn(5, 8, 8, 1).astype(np.float32)
    c = np.zeros((5, 2), np.float32)
    full = calculate_likelihood(
        ZeroModel(), {}, sched, [(x, c)], jax.random.PRNGKey(1)
    )
    padded = calculate_likelihood(
        ZeroModel(), {}, sched, [(x, c)], jax.random.PRNGKey(1), batch_size=8
    )
    # Different noise draws (key handling differs), so statistical closeness.
    assert abs(full - padded) / full < 0.1


def test_elbo_per_batch_formula():
    T = 30
    sched = make_schedule(T)
    mse = jnp.asarray(np.array([1.0, 2.0], np.float32))
    t = jnp.asarray(np.array([5, 20]))
    got = float(elbo_per_batch(sched.beta, sched.alpha_bar, mse, t))
    ab = np.asarray(sched.alpha_bar)
    w = 0.5 * (1.0 / (1.0 - ab[[5, 20]]) - 1.0)
    want = np.mean(w * np.array([1.0, 2.0]))
    np.testing.assert_allclose(got, want, rtol=1e-5)
