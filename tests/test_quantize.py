"""int8 W8A8 quantized conv (models/quantize.py) — serving-path experiment.

Small channel counts keep every int32 accumulator below 2^24 so the fp32
dequantized reference is bit-exact and the QuantConv-vs-reference check is
an equality, not a tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from camels_diffusion_model_tpu.models.quantize import (
    QuantConv,
    dequantized_reference,
    quantize_symmetric,
)


def test_quantize_symmetric_roundtrip_bound():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(4, 8, 8, 16).astype(np.float32)) * 3.0
    q, s = quantize_symmetric(x)
    assert q.dtype == jnp.int8
    # absmax symmetric: |x - q*s| <= s/2 everywhere, and the max hits 127.
    err = np.abs(np.asarray(x) - np.asarray(q, np.float32) * float(s))
    assert err.max() <= float(s) / 2 + 1e-7
    assert int(np.abs(np.asarray(q)).max()) == 127


def test_quantize_per_channel_axis():
    rs = np.random.RandomState(1)
    w = jnp.asarray(rs.randn(3, 3, 8, 12).astype(np.float32))
    q, s = quantize_symmetric(w, axis=(0, 1, 2))
    assert s.shape == (12,)
    back = np.asarray(q, np.float32) * np.asarray(s)
    assert np.abs(back - np.asarray(w)).max() <= float(np.max(s)) / 2 + 1e-7


def test_quantconv_matches_dequantized_reference_exactly():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 8, 8, 8).astype(np.float32))
    kernel = rs.randn(3, 3, 8, 16).astype(np.float32) * 0.1
    bias = rs.randn(16).astype(np.float32) * 0.01

    m = QuantConv(features=16)
    out = m.apply(
        {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}},
        x,
    )
    ref = dequantized_reference(x, jnp.asarray(kernel), jnp.asarray(bias))
    # int32 accumulation == fp32 accumulation of the same integers here
    # (max |acc| = 9*8*127^2 ~= 1.2e6 < 2^24).
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=2e-5)


def test_quantconv_close_to_fp32_conv():
    """W8A8 error on random data stays small relative to output scale."""
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 16, 16, 32).astype(np.float32))
    kernel = jnp.asarray(rs.randn(3, 3, 32, 32).astype(np.float32) * 0.05)
    bias = jnp.asarray(np.zeros(32, np.float32))

    exact = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    q = QuantConv(features=32).apply(
        {"params": {"kernel": kernel, "bias": bias}}, x
    )
    rel = float(
        np.linalg.norm(np.asarray(q) - np.asarray(exact))
        / np.linalg.norm(np.asarray(exact))
    )
    assert rel < 0.02, rel  # ~0.5% typical for W8A8 absmax at these shapes


def test_quantconv_param_tree_matches_nn_conv():
    """QuantConv must load BN-folded nn.Conv checkpoints unchanged."""
    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    ref = nn.Conv(6, kernel_size=(3, 3), padding="SAME")
    vref = ref.init(jax.random.PRNGKey(0), x)
    q = QuantConv(features=6)
    out = q.apply(vref, x)  # same {"params": {kernel, bias}} tree
    assert out.shape == (1, 8, 8, 6)
    shapes_ref = jax.tree_util.tree_map(jnp.shape, vref["params"])
    vq = q.init(jax.random.PRNGKey(0), x)
    shapes_q = jax.tree_util.tree_map(jnp.shape, vq["params"])
    assert shapes_ref == shapes_q
