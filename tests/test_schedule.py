"""Unit tests: DDPM schedule and single-step kernels vs closed form."""

import numpy as np
import pytest

import jax.numpy as jnp

from camels_diffusion_model_tpu import (
    NoiseScaling,
    make_schedule,
    p_sample_step,
    q_sample,
)


def _numpy_schedule(T, beta1=1e-4, beta2=0.02):
    beta = (beta2 - beta1) * np.linspace(0, 1, T + 1) + beta1
    alpha = 1 - beta
    ab = np.cumprod(alpha)
    ab[0] = 1.0
    return beta, alpha, ab


@pytest.mark.parametrize("T", [1, 10, 500, 1500])
def test_schedule_matches_closed_form(T):
    sched = make_schedule(T)
    beta, alpha, ab = _numpy_schedule(T)
    assert sched.beta.shape == (T + 1,)
    np.testing.assert_allclose(sched.beta, beta, rtol=1e-6)
    np.testing.assert_allclose(sched.alpha, alpha, rtol=1e-6)
    np.testing.assert_allclose(sched.alpha_bar, ab, rtol=5e-4)
    assert float(sched.alpha_bar[0]) == 1.0
    assert sched.timesteps == T


def test_schedule_endpoints():
    sched = make_schedule(1000, beta1=1e-4, beta2=0.02)
    assert np.isclose(float(sched.beta[0]), 1e-4)
    assert np.isclose(float(sched.beta[-1]), 0.02)


def test_q_sample_scalings():
    T = 100
    sched = make_schedule(T)
    x = np.full((2, 4, 4, 1), 2.0, np.float32)
    noise = np.full((2, 4, 4, 1), 3.0, np.float32)
    t = np.array([10, 50])
    _, _, ab = _numpy_schedule(T)

    got_ref = np.asarray(q_sample(sched, x, t, noise, NoiseScaling.REFERENCE))
    got_std = np.asarray(q_sample(sched, x, t, noise, NoiseScaling.STANDARD))
    for i, ti in enumerate(t):
        want_ref = np.sqrt(ab[ti]) * 2.0 + (1 - ab[ti]) * 3.0
        want_std = np.sqrt(ab[ti]) * 2.0 + np.sqrt(1 - ab[ti]) * 3.0
        np.testing.assert_allclose(got_ref[i], want_ref, rtol=1e-5)
        np.testing.assert_allclose(got_std[i], want_std, rtol=1e-5)


def test_q_sample_t0_identity():
    sched = make_schedule(50)
    x = np.random.RandomState(0).randn(1, 4, 4, 1).astype(np.float32)
    noise = np.random.RandomState(1).randn(1, 4, 4, 1).astype(np.float32)
    out = np.asarray(q_sample(sched, x, np.array(0), noise))
    np.testing.assert_allclose(out, x, atol=1e-6)


def test_p_sample_step_closed_form():
    T = 100
    sched = make_schedule(T)
    beta, alpha, ab = _numpy_schedule(T)
    rs = np.random.RandomState(0)
    x = rs.randn(3, 4, 4, 1).astype(np.float32)
    eps = rs.randn(3, 4, 4, 1).astype(np.float32)
    z = rs.randn(3, 4, 4, 1).astype(np.float32)
    t = 37
    got = np.asarray(p_sample_step(sched, x, np.array(t), eps, z))
    mean = (x - eps * ((1 - alpha[t]) / np.sqrt(1 - ab[t]))) / np.sqrt(alpha[t])
    want = mean + np.sqrt(beta[t]) * z
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-6)
