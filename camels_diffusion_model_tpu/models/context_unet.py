"""ContextUnet — the parameter-conditional DDPM denoiser family (Flax, NHWC).

Capability parity with the reference architecture family
(canonical 64x64 2-level: code/train_diffusion_paper.py:16-70 and
ContextUnet.py:5-60; deep 128x128 3-level: initial.py:15-75; big
n_feat=256 3-level: main.py:15-85), re-designed TPU-first:

* NHWC layout, configurable compute dtype (bfloat16 on TPU MXU).
* The model is split into a condition-independent ``encode`` (init_conv +
  down path + global-pool bottleneck) and a FiLM-conditioned ``decode``
  (up path).  Classifier-free guidance then runs ``encode`` ONCE and only
  ``decode`` twice — the reference runs the full network twice per guidance
  step (train_diffusion_paper.py:600-606).  ``__call__`` composes the two and
  is numerically identical to the reference's single forward.
* Conditioning is FiLM-style: context embedding is multiplicative, time
  embedding additive (``cemb * h + temb``, train_diffusion_paper.py:67-68),
  applied at the first two decoder stages only.  ``c=None`` (or the
  unconditional CFG branch) means a zero context vector
  (train_diffusion_paper.py:55-56).
* Time is fed as the normalized scalar ``t / timesteps`` through an
  ``EmbedFC(1, .)`` MLP — broadcast semantics match the reference (a single
  scalar broadcasts over the batch).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    EmbedFC,
    GroupNormAct,
    ResidualConvBlock,
    UnetDown,
    UnetUp,
    saveable,
    torch_conv_init,
)

Dtype = Any


class EncoderState(NamedTuple):
    """Condition-independent activations produced by :meth:`ContextUnet.encode`."""

    x0: jax.Array  # init_conv output, (B, H, W, F)
    downs: tuple  # down-path outputs, shallowest first
    hiddenvec: jax.Array  # pooled bottleneck, (B, 1, 1, Cb)


def _act(name: str):
    if name == "relu":
        return nn.relu
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "leaky_relu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    raise ValueError(f"unknown activation {name!r}")


class ContextUnet(nn.Module):
    """Parameter-conditional U-Net denoiser.

    Args:
      in_channels: image channels (1 for HI maps).
      n_feat: base feature width (reference: 128 canonical, 256 big).
      n_cfeat: number of conditioning parameters (1-6).
      height: input spatial size (static; 64 canonical, 128 deep/big).
      levels: number of down/up levels (2 canonical, 3 deep/big).
      up0_act / out_act: activation names for the bottleneck-expand and output
        stages ("relu" | "gelu" | "leaky_relu").
      final_tanh: apply tanh to the output (deep/big variants).
      extra_out_conv: extra 3x3 conv in the output head (big variant).
      shortcut: init_conv residual-projection mode — "learned" (default,
        correct design) or "stochastic" (reference-faithful fresh random 1x1
        conv per forward, diffusion_utilities.py:54; requires a "shortcut"
        RNG stream in apply()).
      dtype: compute dtype (bfloat16 recommended on TPU; params stay float32).
    """

    in_channels: int = 1
    n_feat: int = 128
    n_cfeat: int = 6
    height: int = 64
    levels: int = 2
    up0_act: str = "relu"
    out_act: str = "relu"
    final_tanh: bool = False
    extra_out_conv: bool = False
    shortcut: str = "learned"  # "learned" | "stochastic" (reference quirk)
    fold_bn: bool = False  # inference-only: BatchNorms folded into convs
    pallas_gn: bool = False  # fused Pallas GroupNorm+act in the decoder heads
    dtype: Dtype = jnp.float32

    # ---- variant factories -------------------------------------------------

    @classmethod
    def canonical(cls, n_cfeat: int = 6, n_feat: int = 128, height: int = 64, **kw):
        """The canonical 64x64 2-level model (train_diffusion_paper.py:16-70)."""
        return cls(n_feat=n_feat, n_cfeat=n_cfeat, height=height, levels=2, **kw)

    @classmethod
    def deep(cls, n_cfeat: int = 5, n_feat: int = 128, height: int = 128, **kw):
        """The 128x128 3-level LeakyReLU/Tanh variant (initial.py:15-75)."""
        return cls(
            n_feat=n_feat,
            n_cfeat=n_cfeat,
            height=height,
            levels=3,
            up0_act="leaky_relu",
            out_act="leaky_relu",
            final_tanh=True,
            **kw,
        )

    @classmethod
    def big(cls, n_cfeat: int = 10, n_feat: int = 256, height: int = 128, **kw):
        """The n_feat=256 128x128 3-level GELU/Tanh variant (main.py:15-85)."""
        return cls(
            n_feat=n_feat,
            n_cfeat=n_cfeat,
            height=height,
            levels=3,
            up0_act="gelu",
            out_act="gelu",
            final_tanh=True,
            extra_out_conv=True,
            **kw,
        )

    # ---- module definition -------------------------------------------------

    @property
    def bottleneck_feat(self) -> int:
        return self.n_feat * (2 ** (self.levels - 1))

    def setup(self):
        n = self.n_feat
        # Down-path channel progression: [n, n, 2n] (canonical) or [n, n, 2n, 4n].
        down_feats = [n] + [n * (2**i) for i in range(1, self.levels)]
        self.init_conv = ResidualConvBlock(
            n, is_res=True, shortcut=self.shortcut, fold_bn=self.fold_bn,
            dtype=self.dtype, name="init_conv",
        )
        self.down_blocks = [
            UnetDown(
                down_feats[i], fold_bn=self.fold_bn, dtype=self.dtype,
                name=f"down{i + 1}",
            )
            for i in range(self.levels)
        ]

        cb = self.bottleneck_feat
        self.timeembed1 = EmbedFC(1, cb, dtype=self.dtype, name="timeembed1")
        self.timeembed2 = EmbedFC(1, cb // 2, dtype=self.dtype, name="timeembed2")
        self.contextembed1 = EmbedFC(
            self.n_cfeat, cb, dtype=self.dtype, name="contextembed1"
        )
        self.contextembed2 = EmbedFC(
            self.n_cfeat, cb // 2, dtype=self.dtype, name="contextembed2"
        )

        bottom = self.height // (2**self.levels)
        self.up0_conv = nn.ConvTranspose(
            cb,
            kernel_size=(bottom, bottom),
            strides=(bottom, bottom),
            dtype=self.dtype,
            kernel_init=torch_conv_init(cb * bottom * bottom),
            bias_init=torch_conv_init(cb * bottom * bottom),
            name="up0_conv",
        )
        self.up0_norm = GroupNormAct(
            num_groups=8, epsilon=1e-5, act=self.up0_act,
            use_pallas=self.pallas_gn, dtype=self.dtype, name="up0_norm",
        )

        # Up-path output channels mirror the reference:
        # canonical: up1 -> n, up2 -> n; deep/big: up1 -> 2n, up2 -> n, up3 -> n.
        up_feats = [max(n, cb // (2**i)) for i in range(1, self.levels + 1)]
        self.up_blocks = [
            UnetUp(
                up_feats[i], fold_bn=self.fold_bn, dtype=self.dtype,
                name=f"up{i + 1}",
            )
            for i in range(self.levels)
        ]

        self.out_conv1 = nn.Conv(
            n,
            kernel_size=(3, 3),
            padding="SAME",
            dtype=self.dtype,
            kernel_init=torch_conv_init(2 * n * 9),
            bias_init=torch_conv_init(2 * n * 9),
            name="out_conv1",
        )
        if self.extra_out_conv:
            self.out_conv_extra = nn.Conv(
                n,
                kernel_size=(3, 3),
                padding="SAME",
                dtype=self.dtype,
                kernel_init=torch_conv_init(n * 9),
                bias_init=torch_conv_init(n * 9),
                name="out_conv_extra",
            )
        self.out_norm = GroupNormAct(
            num_groups=8, epsilon=1e-5, act=self.out_act,
            use_pallas=self.pallas_gn, dtype=self.dtype, name="out_norm",
        )
        self.out_conv2 = nn.Conv(
            self.in_channels,
            kernel_size=(3, 3),
            padding="SAME",
            dtype=self.dtype,
            kernel_init=torch_conv_init(n * 9),
            bias_init=torch_conv_init(n * 9),
            name="out_conv2",
        )

    # ---- condition-independent encoder ------------------------------------

    def encode(self, x: jax.Array, *, train: bool = False) -> EncoderState:
        """init_conv + down path + pooled bottleneck.  No t/c dependence."""
        x0 = self.init_conv(x.astype(self.dtype), train=train)
        downs = []
        h = x0
        for blk in self.down_blocks:
            h = blk(h, train=train)
            downs.append(h)
        # AvgPool2d(h // 2**levels) over an input of exactly that size is a
        # global mean (train_diffusion_paper.py:27); then GELU.
        hidden = jnp.mean(h, axis=(1, 2), keepdims=True)
        hidden = nn.gelu(hidden, approximate=False)
        return EncoderState(x0=x0, downs=tuple(downs), hiddenvec=hidden)

    # ---- FiLM embeddings ----------------------------------------------------

    def embed(self, t: jax.Array, c: Optional[jax.Array], batch: int):
        """Compute (cemb1, temb1, cemb2, temb2) as (-1, 1, 1, C) tensors.

        ``c=None`` means zero context (train_diffusion_paper.py:55-56); a
        leading dim of 1 broadcasts over the batch like the reference's
        ``view(-1, C, 1, 1)``.
        """
        if c is None:
            c = jnp.zeros((batch, self.n_cfeat), self.dtype)
        cb = self.bottleneck_feat
        cemb1 = self.contextembed1(c).reshape(-1, 1, 1, cb)
        temb1 = self.timeembed1(t).reshape(-1, 1, 1, cb)
        cemb2 = self.contextembed2(c).reshape(-1, 1, 1, cb // 2)
        temb2 = self.timeembed2(t).reshape(-1, 1, 1, cb // 2)
        return cemb1, temb1, cemb2, temb2

    def time_embed(self, t: jax.Array):
        """Both time-embedding MLPs for a batch of normalized timesteps.

        The sampler precomputes these ONCE for every step of the reverse scan
        (t is known for all steps up front) instead of re-running the MLPs per
        step; returns ((N, cb), (N, cb//2))."""
        return self.timeembed1(t), self.timeembed2(t)

    def context_embed(self, c: jax.Array):
        """Both context-embedding MLPs; context is constant across all reverse
        steps, so the sampler runs these once per batch.  ((N, cb), (N, cb//2))."""
        return self.contextembed1(c), self.contextembed2(c)

    # ---- conditioned decoder ------------------------------------------------

    def decode(
        self,
        enc: EncoderState,
        t: Optional[jax.Array] = None,
        c: Optional[jax.Array] = None,
        *,
        film=None,
        train: bool = False,
    ) -> jax.Array:
        """Decoder with FiLM conditioning.

        Either pass ``t``/``c`` (embeddings computed inline, the reference's
        semantics) or ``film=(cemb1, temb1, cemb2, temb2)`` as flat ``(N, C)``
        arrays precomputed via :meth:`time_embed`/:meth:`context_embed` — the
        sampler's hot path, which removes all four MLPs from the scan body.
        """
        batch = enc.x0.shape[0]
        if film is not None:
            cb = self.bottleneck_feat
            cemb1, temb1, cemb2, temb2 = (
                a.astype(self.dtype).reshape(-1, 1, 1, d)
                for a, d in zip(film, (cb, cb, cb // 2, cb // 2))
            )
        else:
            cemb1, temb1, cemb2, temb2 = self.embed(t, c, batch)

        u = self.up0_norm(saveable(self.up0_conv(enc.hiddenvec)))  # GN + act

        skips = (enc.x0,) + enc.downs  # shallowest -> deepest
        for i, blk in enumerate(self.up_blocks):
            if i == 0:
                u = cemb1 * u + temb1
            elif i == 1:
                u = cemb2 * u + temb2
            u = blk(u, skips[self.levels - i], train=train)

        out = saveable(self.out_conv1(jnp.concatenate([u, enc.x0], axis=-1)))
        if self.extra_out_conv:
            out = saveable(self.out_conv_extra(out))
        out = self.out_norm(out)  # GN + activation
        out = saveable(self.out_conv2(out))
        if self.final_tanh:
            out = jnp.tanh(out)
        return out

    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        c: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        """Full forward: predict epsilon for noisy input ``x`` at normalized
        time ``t`` (scalar or (B,) float of t/timesteps) with context ``c``."""
        enc = self.encode(x, train=train)
        return self.decode(enc, t, c, train=train)


def model_rngs(model, key):
    """RNG-stream dict for ``model.apply``: the reference-faithful stochastic
    init_conv shortcut (diffusion_utilities.py:54) draws a fresh projection
    from the "shortcut" stream each forward; learned-shortcut models need no
    streams.  The branch is on a static module attribute, so it is resolved at
    trace time (jit-safe)."""
    if getattr(model, "shortcut", "learned") == "stochastic":
        return {"shortcut": key}
    return None


def count_params(variables) -> int:
    """Total parameter count of a variables pytree's 'params' collection."""
    params = variables["params"] if "params" in variables else variables
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
