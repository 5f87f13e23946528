"""DPM-Solver++(2M) sampler tests (diffusion/dpm_solver.py).

The solver integrates the same probability-flow ODE as DDIM (eta=0), so its
correctness contract is: deterministic given x_init, and closer to the
fine-step ODE limit than first-order DDIM at an equal step budget
(second-order accuracy).
"""

import numpy as np

import jax
import jax.numpy as jnp

from camels_diffusion_model_tpu import make_schedule
from camels_diffusion_model_tpu.diffusion.ddim import sample_ddim
from camels_diffusion_model_tpu.diffusion.dpm_solver import sample_dpm2m


def test_dpm2m_deterministic_and_finite(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    sched = make_schedule(60)
    params = np.random.RandomState(0).rand(2, 3).astype(np.float32)
    x_init = np.random.RandomState(1).randn(2, 16, 16, 1).astype(np.float32)
    a = sample_dpm2m(
        model, variables, sched, jax.random.PRNGKey(0), params=params,
        n_steps=8, x_init=jnp.asarray(x_init),
    )
    b = sample_dpm2m(
        model, variables, sched, jax.random.PRNGKey(99), params=params,
        n_steps=8, x_init=jnp.asarray(x_init),
    )
    assert a.x.shape == (2, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(a.x)))
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x), atol=1e-6)


def test_dpm2m_second_order_beats_ddim_at_equal_budget(tiny_model_and_vars):
    """At an equal (small) step budget, the 2M solver must land closer to the
    fine-step ODE limit than first-order DDIM."""
    model, variables = tiny_model_and_vars
    sched = make_schedule(200)
    params = np.random.RandomState(0).rand(2, 3).astype(np.float32)
    x_init = np.random.RandomState(1).randn(2, 16, 16, 1).astype(np.float32)

    def run(fn, n):
        return np.asarray(fn(
            model, variables, sched, jax.random.PRNGKey(0), params=params,
            n_steps=n, x_init=jnp.asarray(x_init),
        ).x)

    limit = run(sample_ddim, 200)  # full-grid ODE reference
    err_dpm = np.abs(run(sample_dpm2m, 10) - limit).mean()
    err_ddim = np.abs(run(sample_ddim, 10) - limit).mean()
    assert err_dpm < err_ddim, (err_dpm, err_ddim)


def test_dpm2m_cfg_and_mesh(tiny_model_and_vars):
    from camels_diffusion_model_tpu.parallel.mesh import make_mesh

    model, variables = tiny_model_and_vars
    sched = make_schedule(40)
    params = np.random.RandomState(0).rand(8, 3).astype(np.float32)
    x_init = np.random.RandomState(1).randn(8, 16, 16, 1).astype(np.float32)
    single = sample_dpm2m(
        model, variables, sched, jax.random.PRNGKey(0), params=params,
        n_steps=6, guide_w=2.0, x_init=jnp.asarray(x_init),
    )
    assert np.all(np.isfinite(np.asarray(single.x)))
    mesh = make_mesh(8)
    sharded = sample_dpm2m(
        model, variables, sched, jax.random.PRNGKey(0), params=params,
        n_steps=6, guide_w=2.0, x_init=jnp.asarray(x_init), mesh=mesh,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.x), np.asarray(single.x), atol=1e-4
    )
