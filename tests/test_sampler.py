"""Tests: lax.scan sampler, save schedule, fused CFG equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from camels_diffusion_model_tpu import make_schedule, sample_ddpm, sample_ddpm_from_noise
from camels_diffusion_model_tpu.diffusion.sampler import _predict_eps, _save_schedule


def test_save_schedule_matches_reference_rule():
    """Reference saves at i % 20 == 0, i == T, i < 8 (paper.py:617) iterating
    i = T..1."""
    T = 100
    mask, slots, n = _save_schedule(T, 20)
    steps = np.arange(T, 0, -1)
    want = (steps % 20 == 0) | (steps == T) | (steps < 8)
    np.testing.assert_array_equal(mask, want)
    assert n == want.sum()
    # slots are chronological 0..n-1 over saved steps
    assert slots[mask][0] == 0 and slots[mask][-1] == n - 1
    np.testing.assert_array_equal(np.diff(slots[mask]), 1)


def test_save_schedule_t1500():
    mask, _, n = _save_schedule(1500, 20)
    # 75 multiples of 20, plus i==1500 is one of them, plus i in 1..7 -> 82
    assert n == 75 + 7


def test_sampler_shapes_and_determinism(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    sched = make_schedule(12)
    rng = jax.random.PRNGKey(42)
    params = np.random.RandomState(0).rand(2, 3).astype(np.float32)
    out1 = sample_ddpm(model, variables, sched, rng, n_sample=2, size=16, params=params)
    out2 = sample_ddpm(model, variables, sched, rng, n_sample=2, size=16, params=params)
    assert out1.x.shape == (2, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(out1.x)))
    np.testing.assert_allclose(np.asarray(out1.x), np.asarray(out2.x))
    # intermediates: steps 12..1 with save at %20==0 (none), ==12, <8 -> 1+7
    assert out1.intermediate.shape[0] == 8
    # last saved intermediate equals the final sample
    np.testing.assert_allclose(
        np.asarray(out1.intermediate[-1]), np.asarray(out1.x), atol=1e-6
    )


def test_sampler_no_timing_fast_path_matches(tiny_model_and_vars):
    """measure_timing=False (serving fast path, no per-chunk host barrier)
    returns bit-identical samples and an empty timestep_times array."""
    model, variables = tiny_model_and_vars
    sched = make_schedule(12)
    rng = jax.random.PRNGKey(42)
    params = np.random.RandomState(0).rand(2, 3).astype(np.float32)
    timed = sample_ddpm(
        model, variables, sched, rng, n_sample=2, size=16, params=params
    )
    fast = sample_ddpm(
        model, variables, sched, rng, n_sample=2, size=16, params=params,
        measure_timing=False,
    )
    np.testing.assert_allclose(np.asarray(timed.x), np.asarray(fast.x))
    assert timed.timestep_times.shape == (12,)
    assert np.all(timed.timestep_times > 0)
    assert fast.timestep_times.shape == (0,)


def test_sampler_does_not_delete_caller_x_init(tiny_model_and_vars):
    """The scan chunks donate their carries; a caller-provided device x_init
    must be copied, not aliased — regression for sample_ddpm deleting the
    caller's array (surfaced by the certification script, which reuses one
    x_init across every sampler config)."""
    model, variables = tiny_model_and_vars
    sched = make_schedule(6)
    params = np.random.RandomState(0).rand(2, 3).astype(np.float32)
    x_init = jnp.asarray(
        np.random.RandomState(1).randn(2, 16, 16, 1).astype(np.float32)
    )
    out1 = sample_ddpm(
        model, variables, sched, jax.random.PRNGKey(0), n_sample=2, size=16,
        params=params, x_init=x_init,
    )
    # x_init must still be alive and reusable for a second run
    out2 = sample_ddpm(
        model, variables, sched, jax.random.PRNGKey(0), n_sample=2, size=16,
        params=params, x_init=x_init,
    )
    np.testing.assert_allclose(np.asarray(out1.x), np.asarray(out2.x))


def test_cfg_fused_equals_two_forwards(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    x = np.random.RandomState(0).randn(2, 16, 16, 1).astype(np.float32)
    params = np.random.RandomState(1).rand(2, 3).astype(np.float32)
    t = np.array([0.5], np.float32)
    w = 2.0
    fused = _predict_eps(model, variables, x, t, jnp.asarray(params), True, w)
    eps_c = model.apply(variables, x, t, params)
    eps_u = model.apply(variables, x, t, np.zeros_like(params))
    want = eps_u + w * (eps_c - eps_u)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(want), atol=1e-5)


def test_cfg_sampler_runs(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    sched = make_schedule(6)
    rng = jax.random.PRNGKey(0)
    params = np.random.RandomState(0).rand(2, 3).astype(np.float32)
    out = sample_ddpm(
        model, variables, sched, rng, n_sample=2, size=16, params=params, guide_w=2.0
    )
    assert np.all(np.isfinite(np.asarray(out.x)))


def test_from_noise_none_params(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    sched = make_schedule(6)
    rng = jax.random.PRNGKey(0)
    x_init = np.random.RandomState(0).randn(2, 16, 16, 1).astype(np.float32)
    a = sample_ddpm_from_noise(model, variables, sched, rng, x_init, params=None)
    b = sample_ddpm_from_noise(
        model, variables, sched, rng, x_init,
        params=np.zeros((2, 3), np.float32),
    )
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x), atol=1e-6)


def test_chunked_scan_matches_monolithic(tiny_model_and_vars):
    """Splitting the reverse loop into device-call chunks is bit-identical to
    one monolithic scan (host-carried state, same RNG stream)."""
    from camels_diffusion_model_tpu.diffusion.sampler import _run

    model, variables = tiny_model_and_vars
    sched = make_schedule(11)
    x_init = np.random.RandomState(0).randn(2, 16, 16, 1).astype(np.float32)
    params = np.random.RandomState(1).rand(2, 3).astype(np.float32)
    rng = jax.random.PRNGKey(7)
    mono = _run(model, variables, sched, rng, jnp.asarray(x_init),
                jnp.asarray(params), 0.0, 20, steps_per_call=11)
    chunked = _run(model, variables, sched, rng, jnp.asarray(x_init),
                   jnp.asarray(params), 0.0, 20, steps_per_call=3)
    np.testing.assert_allclose(np.asarray(chunked.x), np.asarray(mono.x), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(chunked.intermediate), np.asarray(mono.intermediate), atol=1e-6
    )


def test_sampler_reproduces_gaussian_with_optimal_denoiser():
    """End-to-end correctness of the whole reverse chain: with the
    analytically optimal eps-predictor for iid Gaussian data N(mu, s^2),
    ancestral sampling must return samples with exactly those statistics.
    This validates p_sample + scan + t-indexing independent of any training."""
    T = 300
    sched = make_schedule(T)
    mu, s = 0.5, 0.1

    class AnalyticModel:
        in_channels = 1
        n_cfeat = 1

        def apply(self, variables, x, t, c=None, **kw):
            ti = jnp.round(t[0] * T).astype(jnp.int32)
            ab = sched.alpha_bar[ti]
            post = (jnp.sqrt(ab) * s**2 * x + (1 - ab) * mu) / (
                ab * s**2 + (1 - ab)
            )
            return (x - jnp.sqrt(ab) * post) / jnp.sqrt(1 - ab)

        def __hash__(self):
            return hash("analytic-sampler-test")

        def __eq__(self, o):
            return isinstance(o, AnalyticModel)

    out = sample_ddpm(
        AnalyticModel(), {}, sched, jax.random.PRNGKey(0),
        n_sample=16, size=32, params=jnp.zeros((16, 1)),
    )
    x = np.asarray(out.x)
    assert abs(x.mean() - mu) < 0.01
    assert abs(x.std() - s) < 0.01


def test_random_params_when_none(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    sched = make_schedule(4)
    out = sample_ddpm(
        model, variables, sched, jax.random.PRNGKey(3), n_sample=2, size=16
    )
    assert np.all(np.isfinite(np.asarray(out.x)))


def test_save_schedule_other_rates():
    for rate in (5, 7, 50):
        T = 60
        mask, slots, n = _save_schedule(T, rate)
        steps = np.arange(T, 0, -1)
        want = (steps % rate == 0) | (steps == T) | (steps < 8)
        np.testing.assert_array_equal(mask, want)
        assert n == want.sum()


def test_sampler_folded_model_matches_unfolded(tiny_model_and_vars):
    """End-to-end: BN-folded inference model + precomputed-FiLM hot path give
    the same trajectories as the unfolded model (fp32)."""
    from camels_diffusion_model_tpu.models.fold_bn import fold_inference

    model, variables = tiny_model_and_vars
    sched = make_schedule(10)
    params = np.random.RandomState(3).rand(2, 3).astype(np.float32)
    base = sample_ddpm(model, variables, sched, jax.random.PRNGKey(0),
                       n_sample=2, size=16, params=params, guide_w=2.0)
    inf_model, inf_vars = fold_inference(model, variables)
    fold = sample_ddpm(inf_model, inf_vars, sched, jax.random.PRNGKey(0),
                       n_sample=2, size=16, params=params, guide_w=2.0)
    np.testing.assert_allclose(
        np.asarray(fold.x), np.asarray(base.x), rtol=2e-4, atol=2e-4
    )


def test_per_chunk_timing_is_real(tiny_model_and_vars):
    """timestep_times come from per-chunk wall-clock measurements and sum to
    (approximately) the total sampling time."""
    model, variables = tiny_model_and_vars
    sched = make_schedule(12)
    out = sample_ddpm(model, variables, sched, jax.random.PRNGKey(0),
                      n_sample=1, size=16)
    assert out.timestep_times.shape == (12,)
    assert np.all(out.timestep_times > 0)
    assert np.sum(out.timestep_times) <= out.sampling_time + 1e-6


def test_pregen_noise_matches_default(tiny_model_and_vars, monkeypatch):
    """CAMELS_PREGEN_NOISE=1 (batched chunk noise draw outside the scan,
    sampler.py::_pregen_noise_enabled) replays the exact per-step key chain:
    the noise STREAMS are bit-identical (the key chain is a replay), so the
    trajectories agree to fp32 rounding (different XLA fusion schedules
    reorder the elementwise update by ~1 ulp), including chunked multi-call
    runs and the t==1 z=0 rule."""
    model, variables = tiny_model_and_vars
    sched = make_schedule(12)
    params = np.random.RandomState(3).rand(2, 3).astype(np.float32)

    def run():
        return sample_ddpm(
            model, variables, sched, jax.random.PRNGKey(4), n_sample=2,
            size=16, params=params, guide_w=2.0, save_rate=3,
        )

    monkeypatch.delenv("CAMELS_PREGEN_NOISE", raising=False)
    base = run()
    # chunked: 12 steps in 5-step device calls exercises the cross-chunk
    # key handoff (key_out must match the default carry chain)
    monkeypatch.setenv("CAMELS_SAMPLER_CHUNK", "5")
    import camels_diffusion_model_tpu.diffusion.sampler as samp_mod

    monkeypatch.setattr(samp_mod, "DEFAULT_STEPS_PER_CALL", 5)
    base_chunked = run()
    np.testing.assert_array_equal(np.asarray(base_chunked.x), np.asarray(base.x))

    monkeypatch.setenv("CAMELS_PREGEN_NOISE", "1")
    fast = run()
    np.testing.assert_allclose(
        np.asarray(fast.x), np.asarray(base.x), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fast.intermediate), np.asarray(base.intermediate),
        rtol=1e-5, atol=1e-5,
    )
