"""CAMELS data pipeline: load -> normalize -> resize -> split -> batches.

Capability parity with the reference's inline data preparation
(train_diffusion_paper.py:221-288), with every normalization recipe that
appears in the reference available by name:

* ``style="code"`` (all ``code/`` trainers, :254-260): shift positive
  (``- min + 1e-8`` if min <= 0), divide by global max, ``log10``, global
  min-max to [0, 1].
* ``style="initial"`` (initial.py:114-126): shift positive, ``log10``,
  z-score, clip to [-1, 1].
* ``style="big"`` (main.py:115-129): shift positive, ``log10``, z-score,
  global min-max to [-1, 1].

Parameter pipeline (:225-252): ``np.repeat(params, 15, axis=0)`` with a
shape assert, per-column min-max to [0, 1] (+1e-8 guard), truncate to the
first ``num_params`` columns or zero-pad; ``param_min``/``param_max`` kept as
checkpoint sidecars.

Split: the reference uses ``torch.random_split`` with ``manual_seed(42)``
(:267-274).  Torch RNG index order is not reproducible outside torch, so the
split here is a deterministic numpy permutation with the same seed and sizes;
the chosen indices are recorded (``split_indices``) so any run is exactly
reproducible.  This divergence is documented and excluded from bit-match
claims.

Host-side prep is numpy (the resize uses the same static interpolation
matrices as ops.resize, exact torch-bilinear semantics); device placement and
sharding live in ``parallel/``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from ..ops.resize import _interp_matrix


@dataclasses.dataclass
class CamelsDataset:
    train_x: np.ndarray  # (N_train, H, W, 1) float32
    train_c: np.ndarray  # (N_train, num_params) float32
    test_x: np.ndarray
    test_c: np.ndarray
    param_min: np.ndarray  # (1, 6) sidecar for inference denorm
    param_max: np.ndarray
    split_indices: np.ndarray  # permutation used for the train/test split
    info: Dict[str, object]

    @property
    def n_train(self) -> int:
        return self.train_x.shape[0]

    @property
    def n_test(self) -> int:
        return self.test_x.shape[0]


def normalize_maps(raw: np.ndarray, style: str = "code") -> np.ndarray:
    """Apply one of the reference's map normalization recipes (float64 like
    the reference's numpy pipeline, cast to float32 by the caller)."""
    data = np.asarray(raw, np.float64)
    min_value = data.min()
    if min_value <= 0:
        data = data - min_value + 1e-8
    if style == "code":
        data = data / data.max()
        data = np.log10(data)
        data = (data - data.min()) / (data.max() - data.min())
    elif style == "initial":
        data = np.log10(data)
        data = (data - data.mean()) / data.std()
        data = np.clip(data, -1.0, 1.0)
    elif style == "big":
        data = np.log10(data)
        data = (data - data.mean()) / data.std()
        dmin, dmax = data.min(), data.max()
        data = 2 * (data - dmin) / (dmax - dmin) - 1
    else:
        raise ValueError(f"unknown normalization style {style!r}")
    return data


def normalize_params(
    param_data: np.ndarray,
    n_maps: int,
    num_params: int,
    expand: int = 15,
    param_index: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Expand, min-max normalize, and column-select conditioning parameters.

    ``param_index`` selects a single column (train_diffusion_spectrum_indiv.py
    semantics); otherwise the first ``num_params`` columns are kept (zero-pad
    if fewer exist).  Returns (normalized (n_maps, num_params), param_min,
    param_max) — min/max over the UN-selected expanded data, matching the
    reference's sidecars (train_diffusion_paper.py:236-242)."""
    expanded = np.repeat(np.asarray(param_data, np.float64), expand, axis=0)
    assert expanded.shape[0] == n_maps, (
        "Parameter expansion doesn't match image count"
    )
    pmin = expanded.min(axis=0, keepdims=True)
    pmax = expanded.max(axis=0, keepdims=True)
    normalized = (expanded - pmin) / (pmax - pmin + 1e-8)
    if param_index is not None:
        normalized = normalized[:, param_index : param_index + 1]
        if num_params != 1:
            raise ValueError("param_index implies num_params == 1")
    elif normalized.shape[1] > num_params:
        normalized = normalized[:, :num_params]
    elif normalized.shape[1] < num_params:
        pad = np.zeros((normalized.shape[0], num_params - normalized.shape[1]))
        normalized = np.concatenate([normalized, pad], axis=1)
    return normalized.astype(np.float32), pmin, pmax


def resize_maps_np(maps: np.ndarray, size: int) -> np.ndarray:
    """Host-side bilinear resize (torch align_corners=False semantics) of a
    (B, H, W) stack using the same static matrices as ops.resize."""
    maps = np.asarray(maps, np.float32)
    wh = _interp_matrix(maps.shape[1], size)
    ww = _interp_matrix(maps.shape[2], size)
    out = np.einsum("oh,bhw->bow", wh, maps)
    return np.einsum("pw,bow->bop", ww, out)


def train_test_split(
    n_total: int, test_size: int, seed: int = 42
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic permutation split -> (train_idx, test_idx, permutation)."""
    perm = np.random.default_rng(seed).permutation(n_total)
    train_idx = perm[: n_total - test_size]
    test_idx = perm[n_total - test_size :]
    return train_idx, test_idx, perm


def load_camels_dataset(
    maps: np.ndarray,
    params: np.ndarray,
    num_params: int,
    height: int = 64,
    test_size: int = 1500,
    seed: int = 42,
    style: str = "code",
    expand: int = 15,
    param_index: Optional[int] = None,
) -> CamelsDataset:
    """Full preparation pipeline from raw arrays to a split dataset.

    ``maps``: (N, H0, W0) raw HI maps; ``params``: (N/expand, 6).
    """
    maps = np.asarray(maps)
    n_maps = maps.shape[0]
    cond, pmin, pmax = normalize_params(
        params, n_maps, num_params, expand=expand, param_index=param_index
    )
    # Multithreaded C++ fast path for the hot host-prep (native/camels_prep.cpp);
    # numpy fallback is numerically equivalent (tests/test_native_prep.py).
    from . import native_prep

    use_native = style == "code" and native_prep.available()
    if use_native:
        data = native_prep.normalize_maps_native(maps)
    else:
        data = normalize_maps(maps, style=style).astype(np.float32)
    if data.shape[1] != height or data.shape[2] != height:
        data = (
            native_prep.resize_maps_native(data, height)
            if use_native
            else resize_maps_np(data, height)
        )
    data = data[..., None]  # NHWC

    train_idx, test_idx, perm = train_test_split(n_maps, test_size, seed)
    info = {
        "total": n_maps,
        "train": len(train_idx),
        "test": len(test_idx),
        "num_params": num_params,
        "original_param_shape": tuple(np.asarray(params).shape),
        "expanded_param_shape": (n_maps, np.asarray(params).shape[1]),
        "final_param_shape": tuple(cond.shape),
        "style": style,
        "height": height,
        "seed": seed,
    }
    return CamelsDataset(
        train_x=data[train_idx],
        train_c=cond[train_idx],
        test_x=data[test_idx],
        test_c=cond[test_idx],
        param_min=pmin,
        param_max=pmax,
        split_indices=perm,
        info=info,
    )


def batch_iterator(
    x: np.ndarray,
    c: np.ndarray,
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    shuffle: bool = True,
    drop_last: bool = False,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Simple epoch iterator over host arrays (DataLoader parity:
    batch_size=32, shuffle for train / ordered for eval,
    train_diffusion_paper.py:277-278)."""
    n = x.shape[0]
    idx = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(idx)
    end = (n // batch_size) * batch_size if drop_last else n
    for start in range(0, end, batch_size):
        sel = idx[start : start + batch_size]
        yield x[sel], c[sel]


def num_batches(n: int, batch_size: int, drop_last: bool = False) -> int:
    return n // batch_size if drop_last else -(-n // batch_size)
