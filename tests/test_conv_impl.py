"""The im2col 3x3-conv formulation is a drop-in for the direct XLA conv.

``CAMELS_CONV_IMPL=im2col`` (models/blocks.py:_conv3x3_impl) reformulates
every Conv3x3 as explicit patches + one MXU-shaped ``dot_general`` — the
remedy candidate for the measured large-batch conv-tiling regression
(ARCHITECTURE.md; scripts/conv_tiling_probe.py).  These tests pin the
drop-in contract: identical parameter tree, equal forward outputs, equal
gradients, and whole-model equality on the canonical ContextUnet.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camels_diffusion_model_tpu.models.blocks import Conv3x3
from camels_diffusion_model_tpu.models.context_unet import ContextUnet


def _init_and_apply(impl, monkeypatch, module, *args, init_args=None):
    monkeypatch.setenv("CAMELS_CONV_IMPL", impl)
    variables = module.init(jax.random.PRNGKey(0), *(init_args or args))
    out = module.apply(variables, *args)
    return variables, out


def test_conv3x3_im2col_matches_direct(monkeypatch):
    x = jnp.asarray(np.random.RandomState(0).randn(4, 16, 16, 8), jnp.float32)
    mod = Conv3x3(features=12)

    v_direct, y_direct = _init_and_apply("direct", monkeypatch, mod, x)
    v_im2col, y_im2col = _init_and_apply("im2col", monkeypatch, mod, x)

    # Identical parameter trees (same paths, shapes, and init values: both
    # draw torch_conv_init from the same RNG key).
    flat_d = jax.tree_util.tree_leaves_with_path(v_direct)
    flat_i = jax.tree_util.tree_leaves_with_path(v_im2col)
    assert [jax.tree_util.keystr(p) for p, _ in flat_d] == [
        jax.tree_util.keystr(p) for p, _ in flat_i
    ]
    for (_, a), (_, b) in zip(flat_d, flat_i):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)

    np.testing.assert_allclose(
        np.asarray(y_im2col), np.asarray(y_direct), rtol=1e-5, atol=1e-5
    )


def test_conv3x3_im2col_gradients_match(monkeypatch):
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 4), jnp.float32)
    mod = Conv3x3(features=6)
    variables = mod.init(jax.random.PRNGKey(0), x)

    def loss(v, x):
        return jnp.sum(mod.apply(v, x) ** 2)

    monkeypatch.setenv("CAMELS_CONV_IMPL", "direct")
    g_direct = jax.grad(loss)(variables, x)
    monkeypatch.setenv("CAMELS_CONV_IMPL", "im2col")
    g_im2col = jax.grad(loss)(variables, x)

    for a, b in zip(
        jax.tree_util.tree_leaves(g_direct), jax.tree_util.tree_leaves(g_im2col)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_contextunet_forward_equal_under_im2col(monkeypatch):
    """Whole-model: a checkpoint trained on the direct path evaluates
    identically (fp32 tolerance) under the im2col path."""
    model = ContextUnet(in_channels=1, n_feat=16, n_cfeat=6, height=16)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 1), jnp.float32)
    c = jnp.asarray(np.random.RandomState(3).rand(2, 6), jnp.float32)
    t = jnp.full((2, 1, 1, 1), 0.5, jnp.float32)

    monkeypatch.setenv("CAMELS_CONV_IMPL", "direct")
    variables = model.init(jax.random.PRNGKey(0), x, t, c)
    y_direct = model.apply(variables, x, t, c)

    monkeypatch.setenv("CAMELS_CONV_IMPL", "im2col")
    y_im2col = model.apply(variables, x, t, c)

    np.testing.assert_allclose(
        np.asarray(y_im2col), np.asarray(y_direct), rtol=2e-4, atol=2e-4
    )


def test_auto_mode_threshold(monkeypatch):
    """auto == im2col only at/above the CAMELS_IM2COL_MIN_BHW threshold."""
    from camels_diffusion_model_tpu.models.blocks import _conv3x3_impl

    monkeypatch.setenv("CAMELS_CONV_IMPL", "auto")
    monkeypatch.setenv("CAMELS_IM2COL_MIN_BHW", str(4 * 16 * 16))
    assert _conv3x3_impl(4, 16, 16) == "im2col"
    assert _conv3x3_impl(2, 16, 16) == "direct"
    monkeypatch.delenv("CAMELS_IM2COL_MIN_BHW")
    assert _conv3x3_impl(512, 64, 64) == "direct"  # default: off until tuned
