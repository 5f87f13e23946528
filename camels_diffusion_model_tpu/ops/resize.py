"""Bilinear resize with exact torch ``F.interpolate(mode='bilinear')`` parity.

The reference downsamples 256x256 CAMELS maps to 64x64 with
``F.interpolate(x, size=(64, 64), mode='bilinear')`` (align_corners=False, no
antialiasing; train_diffusion_paper.py:262).  ``jax.image.resize`` applies
antialiasing when downscaling, which changes the pixel statistics the model is
trained on — so this module implements the torch semantics directly.

TPU-first design: bilinear interpolation along each axis is a (static) sparse
matrix; the resize becomes two small matmuls ``W_h @ X @ W_w^T`` that run on
the MXU and vmap over batch/channels.  Exact parity is tested against torch
(CPU) in tests/test_resize.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) bilinear weight matrix, torch align_corners=False."""
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    lo = np.clip(i0, 0, in_size - 1)
    hi = np.clip(i0 + 1, 0, in_size - 1)
    w = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(w, (rows, lo), 1.0 - frac)
    np.add.at(w, (rows, hi), frac)
    return w


@functools.lru_cache(maxsize=64)
def _resize_fn(in_hw: Tuple[int, int], out_hw: Tuple[int, int]):
    wh = jnp.asarray(_interp_matrix(in_hw[0], out_hw[0]))
    ww = jnp.asarray(_interp_matrix(in_hw[1], out_hw[1]))

    @jax.jit
    def run(x):  # (..., H, W)
        # HIGHEST precision: resize feeds normalization parity tests; the
        # TPU's default bf16 matmul precision is not acceptable here.
        y = jnp.einsum("oh,...hw->...ow", wh, x, precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum(
            "pw,...ow->...op", ww, y, precision=jax.lax.Precision.HIGHEST
        )

    return run


def bilinear_resize(x, out_h: int, out_w: int):
    """Resize the trailing two axes of ``x`` to (out_h, out_w) with torch
    ``F.interpolate(mode='bilinear', align_corners=False)`` semantics."""
    x = jnp.asarray(x)
    in_hw = (x.shape[-2], x.shape[-1])
    return _resize_fn(in_hw, (int(out_h), int(out_w)))(x)


def resize_maps(maps, size: int):
    """Resize a (B, H, W) stack of maps to (B, size, size)."""
    return bilinear_resize(maps, size, size)
