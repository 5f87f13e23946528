"""Per-sample guidance weights: batched sweep equals per-strength runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from camels_diffusion_model_tpu import make_schedule, sample_ddpm
from camels_diffusion_model_tpu.diffusion.sampler import _predict_eps


def test_per_sample_w_matches_scalar(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    x = np.random.RandomState(0).randn(4, 16, 16, 1).astype(np.float32)
    params = np.random.RandomState(1).rand(4, 3).astype(np.float32)
    t = np.array([0.5], np.float32)
    scalar = _predict_eps(model, variables, x, t, jnp.asarray(params), True, 2.0)
    vector = _predict_eps(
        model, variables, x, t, jnp.asarray(params), True,
        jnp.full((4,), 2.0, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(scalar), np.asarray(vector), atol=1e-6)


def test_per_sample_w_mixes_strengths(tiny_model_and_vars):
    """Each row of a per-sample-w batch matches the corresponding scalar-w
    prediction."""
    model, variables = tiny_model_and_vars
    rs = np.random.RandomState(2)
    x = np.tile(rs.randn(1, 16, 16, 1).astype(np.float32), (3, 1, 1, 1))
    params = np.tile(rs.rand(1, 3).astype(np.float32), (3, 1))
    t = np.array([0.3], np.float32)
    ws = np.array([1.0, 2.0, 5.0], np.float32)
    mixed = np.asarray(
        _predict_eps(model, variables, x, t, jnp.asarray(params), True,
                     jnp.asarray(ws))
    )
    for i, w in enumerate(ws):
        single = np.asarray(
            _predict_eps(model, variables, x[i : i + 1], t,
                         jnp.asarray(params[i : i + 1]), True, float(w))
        )
        np.testing.assert_allclose(mixed[i : i + 1], single, atol=1e-4)


def test_sampler_accepts_vector_w(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    sched = make_schedule(5)
    params = np.random.RandomState(0).rand(4, 3).astype(np.float32)
    out = sample_ddpm(
        model, variables, sched, jax.random.PRNGKey(0),
        n_sample=4, size=16, params=params,
        guide_w=np.array([1.0, 2.0, 3.0, 5.0], np.float32),
    )
    assert np.all(np.isfinite(np.asarray(out.x)))


def test_sampler_rejects_mixed_zero_w(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    sched = make_schedule(4)
    params = np.random.RandomState(0).rand(2, 3).astype(np.float32)
    with pytest.raises(ValueError):
        sample_ddpm(
            model, variables, sched, jax.random.PRNGKey(0),
            n_sample=2, size=16, params=params,
            guide_w=np.array([0.0, 2.0], np.float32),
        )
