"""NN building blocks for the ContextUnet family (Flax linen, NHWC, TPU-first).

Capability parity with the reference's building blocks
(reference: code/diffusion_utilities.py:13-145), re-designed for TPU:

* NHWC layout throughout (TPU conv layouts; the reference is NCHW).
* Configurable compute dtype (bfloat16 on TPU); normalization statistics are
  always accumulated in float32.
* The reference's ``ResidualConvBlock`` has a quirk: when ``is_res`` and the
  channel counts differ it constructs a *fresh, randomly initialized* 1x1
  conv inside ``forward()`` on every call (diffusion_utilities.py:54) — i.e.
  the shortcut is a new random projection per forward pass.  Here the shortcut
  is a **learned** 1x1 conv by default (``shortcut="learned"``), which is the
  correct design; ``shortcut="stochastic"`` reproduces the reference behavior
  exactly (a fresh Kaiming-uniform projection drawn from the ``"shortcut"``
  RNG stream each call) for fidelity experiments.  This divergence is
  intentional and excluded from bit-match claims.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Dtype = Any


def _conv3x3_impl(batch: int, h: int, w: int) -> str:
    """Resolve the 3x3-conv implementation for a given activation shape.

    ``CAMELS_CONV_IMPL`` selects the formulation (read at trace time — set it
    before the first jit of a given shape):

    * ``direct`` (default): ``lax.conv_general_dilated`` via ``nn.Conv`` —
      XLA's native conv path, fastest at the reference batch sizes.
    * ``im2col``: explicit patches + ``dot_general`` — an MXU-shaped matmul
      that bypasses XLA's conv tiler entirely.  Remedy candidate for the
      measured large-batch tiling regression (ARCHITECTURE.md: ~46% of
      roofline at batch >= 256; scripts/conv_tiling_probe.py isolates it
      per shape).
    * ``auto``: im2col only when ``batch*h*w >= CAMELS_IM2COL_MIN_BHW``
      (default 2**31, i.e. off until the TPU probe pins the crossover).

    Both paths share one parameter tree (kernel (3,3,Cin,Cout) + bias under
    the ``conv`` scope), so checkpoints are interchangeable.
    """
    mode = os.environ.get("CAMELS_CONV_IMPL", "direct")
    if mode == "auto":
        min_bhw = int(os.environ.get("CAMELS_IM2COL_MIN_BHW", str(2**31)))
        return "im2col" if batch * h * w >= min_bhw else "direct"
    return mode


def saveable(x: jax.Array) -> jax.Array:
    """Mark a conv/matmul output as a named checkpoint residual.

    Transparent identity everywhere EXCEPT under the trainer's selective
    rematerialization (``make_train_step(remat="convs")``), whose policy
    ``save_only_these_names("conv_out")`` stores exactly these tensors for
    the backward pass and recomputes everything else (BatchNorm/GroupNorm
    statistics, activations, concats, pools — cheap VPU work).  The training
    step is HBM-bound at the reference batch size (ARCHITECTURE.md audit:
    94% of the bandwidth roofline, ~3 saved tensors per conv layer by
    default), so shrinking saved-activation traffic to ~1 tensor per conv
    trades negligible recompute FLOPs for the dominant cost.
    """
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, "conv_out")


def torch_conv_init(fan_in: int):
    """Initializers matching torch's Conv2d/Linear defaults
    (kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)), and the
    same bound for bias).  Used so training dynamics are statistically
    comparable to the reference; parity is statistical, not bitwise."""
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _Im2ColConv3x3(nn.Module):
    """3x3 same-padding conv as explicit patches + one MXU matmul.

    Mathematically identical to ``nn.Conv(features, (3, 3), padding="SAME")``
    and shares its exact parameter tree (``kernel`` (3, 3, Cin, Cout) +
    ``bias``), so checkpoints and torch_interop mappings are unchanged.
    Exists as the ``CAMELS_CONV_IMPL=im2col`` remedy for the large-batch
    conv-tiling regression — see :func:`_conv3x3_impl`.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, cin = x.shape
        fan_in = cin * 9
        kernel = self.param(
            "kernel", torch_conv_init(fan_in), (3, 3, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", torch_conv_init(fan_in), (self.features,), jnp.float32
        )
        xd = x.astype(self.dtype)
        # (B, H, W, Cin*9); feature order is (Cin, kh, kw) blocks — reorder
        # the HWIO kernel to match (verified by test_conv_impl equality).
        patches = lax.conv_general_dilated_patches(
            xd, (3, 3), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        m = patches.reshape(b * h * w, cin * 9)
        k = jnp.transpose(kernel.astype(self.dtype), (2, 0, 1, 3)).reshape(
            cin * 9, self.features
        )
        y = lax.dot_general(
            m, k, (((1,), (0,)), ((), ())),
            preferred_element_type=self.dtype,
        )
        y = y.reshape(b, h, w, self.features) + bias.astype(self.dtype)
        return y


class Conv3x3(nn.Module):
    """3x3 same-padding conv with torch-default initialization.

    The implementation (XLA direct conv vs im2col matmul) is selected per
    activation shape by :func:`_conv3x3_impl`; both share one parameter tree.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1] * 9
        if _conv3x3_impl(x.shape[0], x.shape[1], x.shape[2]) == "im2col":
            return saveable(
                _Im2ColConv3x3(self.features, dtype=self.dtype, name="conv")(x)
            )
        return saveable(
            nn.Conv(
                self.features,
                kernel_size=(3, 3),
                padding="SAME",
                dtype=self.dtype,
                kernel_init=torch_conv_init(fan_in),
                bias_init=torch_conv_init(fan_in),
                name="conv",
            )(x)
        )


class ResidualConvBlock(nn.Module):
    """Two (3x3 conv -> BatchNorm -> ReLU) stages with an optional residual add.

    Parity: diffusion_utilities.py:13-75.  BatchNorm runs in float32 and — under
    pjit data parallelism — computes *global* batch statistics automatically
    (XLA inserts the cross-chip reductions), which is the TPU-native analogue
    of sync-BN.
    """

    out_channels: int
    is_res: bool = False
    shortcut: str = "learned"  # "learned" | "stochastic"
    fold_bn: bool = False  # inference-only: BN running stats folded into convs
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        in_channels = x.shape[-1]

        def stage(h, name):
            h = Conv3x3(self.out_channels, dtype=self.dtype, name=f"{name}")(h)
            if not self.fold_bn:
                h = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=jnp.float32,
                    name=f"{name}_bn",
                )(h)
            return nn.relu(h)

        x1 = stage(x, "conv1")
        x2 = stage(x1, "conv2")

        if not self.is_res:
            return x2

        if in_channels == self.out_channels:
            return x + x2

        if self.shortcut == "learned":
            proj = nn.Conv(
                self.out_channels,
                kernel_size=(1, 1),
                dtype=self.dtype,
                kernel_init=torch_conv_init(in_channels),
                bias_init=torch_conv_init(in_channels),
                name="shortcut",
            )(x)
        elif self.shortcut == "stochastic":
            # Reference-faithful mode: fresh random 1x1 projection each call
            # (diffusion_utilities.py:54).  Requires a "shortcut" RNG stream.
            key = self.make_rng("shortcut")
            kkey, bkey = jax.random.split(key)
            bound = 1.0 / (in_channels**0.5)
            kernel = jax.random.uniform(
                kkey, (1, 1, in_channels, self.out_channels), jnp.float32, -bound, bound
            ).astype(self.dtype)
            bias = jax.random.uniform(
                bkey, (self.out_channels,), jnp.float32, -bound, bound
            ).astype(self.dtype)
            proj = (
                jax.lax.conv_general_dilated(
                    x.astype(self.dtype),
                    kernel,
                    window_strides=(1, 1),
                    padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                + bias
            )
        else:
            raise ValueError(f"unknown shortcut mode: {self.shortcut!r}")
        return proj + x2


class UnetDown(nn.Module):
    """Two ResidualConvBlocks then 2x2 max-pool (diffusion_utilities.py:103-116)."""

    out_channels: int
    fold_bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = ResidualConvBlock(
            self.out_channels, fold_bn=self.fold_bn, dtype=self.dtype, name="block1"
        )(x, train=train)
        x = ResidualConvBlock(
            self.out_channels, fold_bn=self.fold_bn, dtype=self.dtype, name="block2"
        )(x, train=train)
        return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class UnetUp(nn.Module):
    """Concat skip -> 2x2 stride-2 transposed conv -> two ResidualConvBlocks
    (diffusion_utilities.py:79-100)."""

    out_channels: int
    fold_bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, *, train: bool = False) -> jax.Array:
        x = jnp.concatenate([x, skip], axis=-1)
        # torch's kaiming_uniform on ConvTranspose2d uses weight.size(1) =
        # out_channels (weight is (I, O, kh, kw)), so the init bound is
        # 1/sqrt(out_channels * kh * kw).
        fan_in = self.out_channels * 4
        x = saveable(
            nn.ConvTranspose(
                self.out_channels,
                kernel_size=(2, 2),
                strides=(2, 2),
                dtype=self.dtype,
                kernel_init=torch_conv_init(fan_in),
                bias_init=torch_conv_init(fan_in),
                name="upconv",
            )(x)
        )
        x = ResidualConvBlock(
            self.out_channels, fold_bn=self.fold_bn, dtype=self.dtype, name="block1"
        )(x, train=train)
        x = ResidualConvBlock(
            self.out_channels, fold_bn=self.fold_bn, dtype=self.dtype, name="block2"
        )(x, train=train)
        return x


class GroupNormAct(nn.Module):
    """GroupNorm + affine + activation with a fused Pallas TPU path.

    Parameter names ("scale"/"bias") match ``nn.GroupNorm`` exactly, so
    checkpoints are interchangeable between the XLA and Pallas paths and with
    torch_interop's up0_norm/out_norm mapping.  Statistics are fp32 either
    way; ``use_pallas`` selects the single-HBM-pass kernel
    (ops/pallas/groupnorm.py) A/B'd in ARCHITECTURE.md.
    """

    num_groups: int = 8
    epsilon: float = 1e-5
    act: str = "relu"
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from .context_unet import _act  # shared activation registry

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.use_pallas and x.ndim == 4:
            from ..ops.pallas.groupnorm import fused_groupnorm_act

            return fused_groupnorm_act(
                x, scale, bias, num_groups=self.num_groups,
                eps=self.epsilon, act=self.act,
            ).astype(self.dtype)
        b, h, w, _ = x.shape
        xg = x.astype(jnp.float32).reshape(
            b, h * w, self.num_groups, c // self.num_groups
        )
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        var = jnp.var(xg, axis=(1, 3), keepdims=True)
        y = ((xg - mean) * jax.lax.rsqrt(var + self.epsilon)).reshape(x.shape)
        y = y * scale + bias
        return _act(self.act)(y.astype(self.dtype))


class EmbedFC(nn.Module):
    """Linear -> GELU -> Linear embedding MLP; flattens input to
    ``(-1, input_dim)`` (diffusion_utilities.py:118-145).

    With a scalar/broadcast input (e.g. the sampler's single normalized
    timestep), the output has leading dim 1 and broadcasts over the batch —
    same semantics as the reference.
    """

    input_dim: int
    emb_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.asarray(x, self.dtype).reshape(-1, self.input_dim)
        x = nn.Dense(
            self.emb_dim,
            dtype=self.dtype,
            kernel_init=torch_conv_init(self.input_dim),
            bias_init=torch_conv_init(self.input_dim),
            name="fc1",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(
            self.emb_dim,
            dtype=self.dtype,
            kernel_init=torch_conv_init(self.emb_dim),
            bias_init=torch_conv_init(self.emb_dim),
            name="fc2",
        )(x)
        return x
