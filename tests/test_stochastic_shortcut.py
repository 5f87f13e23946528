"""End-to-end plumbing of the reference-faithful stochastic init_conv
shortcut (diffusion_utilities.py:54): train step, sampler, likelihood passes,
and the experiment runner all thread the "shortcut" RNG stream."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from camels_diffusion_model_tpu.diffusion import make_schedule, sample_ddpm
from camels_diffusion_model_tpu.diffusion.likelihood import (
    calculate_elbo_and_bpd,
    calculate_likelihood,
)
from camels_diffusion_model_tpu.models import ContextUnet
from camels_diffusion_model_tpu.training import create_train_state, make_train_step


@pytest.fixture(scope="module")
def stochastic_setup():
    model = ContextUnet(n_feat=8, n_cfeat=3, height=16, levels=2,
                        shortcut="stochastic")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "shortcut": jax.random.PRNGKey(1)},
        np.zeros((1, 16, 16, 1), np.float32),
        np.array([0.5], np.float32),
    )
    return model, variables


def test_train_step_stochastic(stochastic_setup):
    model, variables = stochastic_setup
    state = create_train_state(model, variables, 1e-3, 10, 1)
    step = make_train_step(model, 8)
    rs = np.random.RandomState(0)
    x = rs.rand(4, 16, 16, 1).astype(np.float32)
    c = rs.rand(4, 3).astype(np.float32)
    s1, m1 = step(state, x, c, jax.random.PRNGKey(7))
    s1b, m1b = step(state, x, c, jax.random.PRNGKey(7))
    s2, m2 = step(state, x, c, jax.random.PRNGKey(8))
    # reproducible under a fixed key, different across keys (fresh projection)
    assert np.isclose(float(m1["loss"]), float(m1b["loss"]))
    assert not np.isclose(float(m1["loss"]), float(m2["loss"]))


def test_sampler_stochastic(stochastic_setup):
    model, variables = stochastic_setup
    sched = make_schedule(10)
    params = np.random.RandomState(0).rand(2, 3).astype(np.float32)
    a = sample_ddpm(model, variables, sched, jax.random.PRNGKey(0),
                    n_sample=2, size=16, params=params, guide_w=2.0)
    b = sample_ddpm(model, variables, sched, jax.random.PRNGKey(0),
                    n_sample=2, size=16, params=params, guide_w=2.0)
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(a.x)))
    # same noise path but a different key changes the shortcut draws too —
    # outputs must differ (the z-noise alone would also differ; this is a
    # smoke check that the stream is live, the unit test above isolates it)
    c_ = sample_ddpm(model, variables, sched, jax.random.PRNGKey(5),
                     n_sample=2, size=16, params=params, guide_w=2.0)
    assert not np.allclose(np.asarray(a.x), np.asarray(c_.x))


def test_likelihood_passes_stochastic(stochastic_setup):
    model, variables = stochastic_setup
    sched = make_schedule(6)
    rs = np.random.RandomState(0)
    batches = [(rs.rand(4, 16, 16, 1).astype(np.float32),
                rs.rand(4, 3).astype(np.float32))]
    elbo, bpd = calculate_elbo_and_bpd(
        model, variables, sched, batches, jax.random.PRNGKey(0), dims=256
    )
    nll = calculate_likelihood(
        model, variables, sched, batches, jax.random.PRNGKey(1)
    )
    assert np.isfinite(elbo) and np.isfinite(bpd) and np.isfinite(nll)


@pytest.mark.slow
def test_experiment_runner_stochastic(tmp_path):
    """run_experiment trains AND samples end-to-end in the reference-faithful
    mode via ExperimentConfig(shortcut="stochastic")."""
    from camels_diffusion_model_tpu.cli import run_experiment
    from camels_diffusion_model_tpu.config import ExperimentConfig

    cfg = ExperimentConfig(
        mode="condition",
        lrate=1e-4,
        n_epoch=1,
        timesteps=6,
        num_params=2,
        n_feat=8,
        height=16,
        batch_size=16,
        synthetic_param_sets=3,
        data_size=32,
        output_root=str(tmp_path),
        n_eval_images=5,
        shortcut="stochastic",
    )
    res = run_experiment(cfg)
    assert os.path.exists(os.path.join(res["output_dir"], "reconstructed_images.png"))
