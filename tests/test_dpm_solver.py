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


def test_dpm2m_stochastic_shortcut():
    """The reference-faithful stochastic init_conv shortcut draws a fresh
    projection per forward from a dedicated RNG stream — sample_dpm2m must
    plumb that key (it used to crash inside the jitted scan)."""
    from camels_diffusion_model_tpu.models import ContextUnet

    model = ContextUnet(n_feat=8, n_cfeat=3, height=16, levels=2,
                        shortcut="stochastic")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "shortcut": jax.random.PRNGKey(1)},
        np.zeros((1, 16, 16, 1), np.float32),
        np.array([0.5], np.float32),
    )
    sched = make_schedule(40)
    params = np.random.RandomState(0).rand(2, 3).astype(np.float32)
    x_init = np.random.RandomState(1).randn(2, 16, 16, 1).astype(np.float32)
    a = sample_dpm2m(
        model, variables, sched, jax.random.PRNGKey(0), params=params,
        n_steps=6, x_init=jnp.asarray(x_init),
    )
    b = sample_dpm2m(
        model, variables, sched, jax.random.PRNGKey(0), params=params,
        n_steps=6, x_init=jnp.asarray(x_init),
    )
    assert np.all(np.isfinite(np.asarray(a.x)))
    # reproducible under a fixed key; a different key changes the draws
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x), atol=1e-6)
    c_ = sample_dpm2m(
        model, variables, sched, jax.random.PRNGKey(5), params=params,
        n_steps=6, x_init=jnp.asarray(x_init),
    )
    assert not np.allclose(np.asarray(a.x), np.asarray(c_.x))


def test_mixed_per_sample_guide_w_rejected(tiny_model_and_vars):
    """Zeros among positive per-sample guidance weights are ambiguous (the
    reference's w=0 is a single-forward semantics) — all fast samplers must
    reject them like sample_ddpm's _run does."""
    import pytest

    model, variables = tiny_model_and_vars
    sched = make_schedule(20)
    params = np.random.RandomState(0).rand(2, 3).astype(np.float32)
    x_init = np.random.RandomState(1).randn(2, 16, 16, 1).astype(np.float32)
    mixed_w = np.array([0.0, 2.0], np.float32)
    for fn in (sample_ddim, sample_dpm2m):
        with pytest.raises(ValueError, match="all-positive"):
            fn(
                model, variables, sched, jax.random.PRNGKey(0), params=params,
                n_steps=4, guide_w=mixed_w, x_init=jnp.asarray(x_init),
            )


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
