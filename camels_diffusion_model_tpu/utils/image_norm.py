"""Per-image normalization helpers and plotting-format utilities.

Parity with the reference's small display helpers
(diffusion_utilities.py:147-185): ``unorm`` (per-image min-max to [0,1]),
``norm_all`` (over a (T, S, H, W, C) trajectory store), ``norm_batch`` (the
``norm_torch`` analogue over an image batch), and ``gen_tst_context`` (the
leftover 5-class one-hot test contexts from the deeplearning.ai sprites
course, kept for API completeness; unused by the CAMELS flows).
"""

from __future__ import annotations

import numpy as np


def unorm(x: np.ndarray) -> np.ndarray:
    """Per-image unity norm to [0,1]; x is (H, W, C) (diffusion_utilities.py:147-152)."""
    xmax = x.max((0, 1))
    xmin = x.min((0, 1))
    return (x - xmin) / (xmax - xmin)


def norm_all(store: np.ndarray, n_t: int, n_s: int) -> np.ndarray:
    """Unity-norm every (timestep, sample) frame (diffusion_utilities.py:154-160)."""
    nstore = np.zeros_like(store)
    for t in range(n_t):
        for s in range(n_s):
            nstore[t, s] = unorm(store[t, s])
    return nstore


def norm_batch(x_all: np.ndarray) -> np.ndarray:
    """Per-image unity norm over an NHWC batch (norm_torch analogue,
    diffusion_utilities.py:162-171)."""
    x = np.asarray(x_all)
    xmax = x.max((1, 2), keepdims=True)
    xmin = x.min((1, 2), keepdims=True)
    return (x - xmin) / (xmax - xmin)


def gen_tst_context(n_cfeat: int = 5):
    """Leftover 5-class one-hot test contexts (diffusion_utilities.py:173-185)."""
    block = np.array(
        [
            [1, 0, 0, 0, 0],
            [0, 1, 0, 0, 0],
            [0, 0, 1, 0, 0],
            [0, 0, 0, 1, 0],
            [0, 0, 0, 0, 1],
            [0, 0, 0, 0, 0],
        ],
        np.float32,
    )
    vec = np.tile(block, (6, 1))
    return len(vec), vec
