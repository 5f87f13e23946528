"""Post-training int8 quantization for the serving path (W8A8, dynamic).

The v5e MXU advertises 2x int8 throughput over bf16 (394 TOPS vs 197
TF/s).  This module provides the quantized-conv building block and the
weight-preparation helper for an int8 serving experiment:

* weights: per-output-channel symmetric int8 (absmax / 127) — computed
  from the fp32 kernel at apply time; inside the sampler's ``lax.scan``
  the kernel is loop-invariant, so XLA hoists the quantization out of the
  scan and it costs nothing per step.
* activations: dynamic per-tensor symmetric int8 (absmax / 127), computed
  per forward.  One abs-max reduction + round/clip per conv input — VPU
  work on a tensor the conv reads anyway, and the int8 operand halves the
  HBM traffic vs bf16.
* accumulation: int32 (``preferred_element_type``), rescaled by
  ``s_x * s_w[o]`` back to the compute dtype, then bias.

Decision gate (scripts/int8_probe.py): the quantized path is only wired
into the model when the probe measures >=1.4x on the FLOP-dominant conv
shapes — whether XLA lowers s8xs8->s32 convs onto the doubled-rate MXU
path at these shapes is an empirical question, not a datasheet one.

This is a NEW serving capability with no reference counterpart (the
reference is fp32-only, SURVEY.md §2); numerical fidelity is therefore
certified the same way as the reduced-step samplers: honest mean-P(k)
comparison against the exact bf16 chain (scripts/certify_fast_sampler.py
protocol), never assumed.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Symmetric int8 range.  +-127 (not -128) keeps the quantizer symmetric so
# s * q is an odd function — standard practice for weight/activation PTQ.
_QMAX = 127.0


def quantize_symmetric(x: jax.Array, axis=None):
    """Symmetric absmax int8 quantization.

    Returns ``(q, scale)`` with ``q`` int8 and ``x ~= q * scale``.  ``axis``
    selects the reduction axes KEPT OUT of the scale (None = per-tensor;
    for a HWIO conv kernel, ``axis=(0, 1, 2)`` gives per-output-channel
    scales of shape (O,)).
    """
    absmax = jnp.max(jnp.abs(x), axis=axis, keepdims=axis is not None)
    scale = jnp.maximum(absmax, 1e-12) / _QMAX
    q = jnp.clip(jnp.round(x / scale), -_QMAX, _QMAX).astype(jnp.int8)
    if axis is not None:
        scale = jnp.squeeze(scale, axis=axis)
    return q, scale


class QuantConv(nn.Module):
    """Drop-in int8 W8A8 replacement for a same-padding ``nn.Conv``.

    Parameter names and shapes ("kernel" (kh, kw, I, O), "bias" (O,))
    match ``nn.Conv`` exactly, so BN-folded inference checkpoints load
    unchanged; quantization happens at apply time from the fp32 master
    weights (hoisted out of the sampling scan by XLA — see module
    docstring).
    """

    features: int
    kernel_size: tuple = (3, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.zeros, (kh, kw, in_ch, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )

        # Per-output-channel weight scales; loop-invariant under scan.
        w_q, s_w = quantize_symmetric(kernel, axis=(0, 1, 2))  # s_w: (O,)
        # Dynamic per-tensor activation scale (fp32 absmax).
        x32 = x.astype(jnp.float32)
        x_q, s_x = quantize_symmetric(x32)  # scalar scale

        acc = jax.lax.conv_general_dilated(
            x_q,
            w_q,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (s_x * s_w) + bias
        return y.astype(self.dtype)


def dequantized_reference(x, kernel, bias, dtype=jnp.float32):
    """The exact fp32 conv a QuantConv approximates, applied to the SAME
    quantized operands — for unit tests: QuantConv(x) must equal
    conv(dequant(x_q), dequant(w_q)) + bias exactly (int32 accumulation is
    lossless; the only error is the quantization rounding itself)."""
    w_q, s_w = quantize_symmetric(kernel, axis=(0, 1, 2))
    x_q, s_x = quantize_symmetric(x.astype(jnp.float32))
    y = jax.lax.conv_general_dilated(
        x_q.astype(jnp.float32) * s_x,
        w_q.astype(jnp.float32) * s_w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (y + bias).astype(dtype)
