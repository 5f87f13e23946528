"""Pallas TPU kernels vs XLA references (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from camels_diffusion_model_tpu import make_schedule, p_sample_step
from camels_diffusion_model_tpu.ops.pallas import (
    fused_film,
    fused_groupnorm_act,
    fused_p_sample_step,
)


def test_fused_film_matches_xla():
    rs = np.random.RandomState(0)
    x = rs.randn(2, 8, 8, 128).astype(np.float32)
    scale = rs.randn(2, 1, 1, 128).astype(np.float32)
    shift = rs.randn(2, 1, 1, 128).astype(np.float32)
    got = np.asarray(fused_film(x, scale, shift, interpret=True))
    np.testing.assert_allclose(got, scale * x + shift, rtol=1e-5, atol=1e-6)


def test_fused_film_broadcast_scale():
    rs = np.random.RandomState(1)
    x = rs.randn(3, 4, 4, 128).astype(np.float32)
    scale = rs.randn(1, 1, 1, 128).astype(np.float32)
    shift = rs.randn(1, 1, 1, 128).astype(np.float32)
    got = np.asarray(fused_film(x, scale, shift, interpret=True))
    np.testing.assert_allclose(got, scale * x + shift, rtol=1e-5, atol=1e-6)


def test_fused_p_sample_step_matches_reference():
    T = 50
    sched = make_schedule(T)
    rs = np.random.RandomState(0)
    x = rs.randn(2, 16, 16, 1).astype(np.float32)
    eps = rs.randn(2, 16, 16, 1).astype(np.float32)
    z = rs.randn(2, 16, 16, 1).astype(np.float32)
    t = 17
    got = np.asarray(
        fused_p_sample_step(
            sched.beta, sched.alpha, sched.alpha_bar, x, t, eps, z,
            interpret=True,
        )
    )
    want = np.asarray(p_sample_step(sched, jnp.asarray(x), jnp.asarray(t),
                                    jnp.asarray(eps), jnp.asarray(z)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("act", ["relu", "gelu", "leaky_relu", "none"])
def test_fused_groupnorm_act_matches_flax(act):
    from flax import linen as nn

    rs = np.random.RandomState(0)
    x = rs.randn(2, 4, 4, 128).astype(np.float32)
    gamma = rs.rand(128).astype(np.float32) + 0.5
    beta = rs.randn(128).astype(np.float32)

    got = np.asarray(
        fused_groupnorm_act(
            jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
            num_groups=8, act=act, interpret=True,
        )
    )

    gn = nn.GroupNorm(num_groups=8, epsilon=1e-5)
    want = gn.apply(
        {"params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}},
        jnp.asarray(x),
    )
    want = np.asarray(want)
    if act == "relu":
        want = np.maximum(want, 0)
    elif act == "gelu":
        import scipy.special as sp

        want = 0.5 * want * (1 + sp.erf(want / np.sqrt(2)))
    elif act == "leaky_relu":
        want = np.where(want > 0, want, 0.2 * want)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_groupnormact_module_pallas_matches_xla():
    """The decoder's GroupNormAct module: Pallas path (interpret mode on CPU)
    == XLA path, with identical parameter structure to nn.GroupNorm."""
    import jax
    from camels_diffusion_model_tpu.models.blocks import GroupNormAct

    rs = np.random.RandomState(0)
    x = rs.randn(2, 8, 8, 16).astype(np.float32)
    for act in ("relu", "gelu", "leaky_relu"):
        xla_mod = GroupNormAct(num_groups=8, act=act, use_pallas=False)
        v = xla_mod.init(jax.random.PRNGKey(0), x)
        v = {"params": {"scale": np.asarray(rs.rand(16), np.float32) + 0.5,
                        "bias": np.asarray(rs.randn(16), np.float32)}}
        want = xla_mod.apply(v, x)
        # interpret-mode Pallas (no TPU needed)
        from camels_diffusion_model_tpu.ops.pallas.groupnorm import (
            fused_groupnorm_act,
        )
        got = fused_groupnorm_act(
            jnp.asarray(x), jnp.asarray(v["params"]["scale"]),
            jnp.asarray(v["params"]["bias"]), num_groups=8, act=act,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


def test_groupnormact_params_match_nn_groupnorm():
    import jax
    from flax import linen as nn
    from camels_diffusion_model_tpu.models.blocks import GroupNormAct

    x = np.random.RandomState(0).randn(1, 4, 4, 16).astype(np.float32)
    a = GroupNormAct(num_groups=8).init(jax.random.PRNGKey(0), x)
    b = nn.GroupNorm(num_groups=8).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
