"""Standalone map dataset with log1p/[-1,1] normalization + sanity checks.

Parity with the reference's (unused-by-the-trainers) ``CustomDataset``
(diffusion_utilities.py:220-296): loads an .npy stack, computes global
statistics once, per-item applies ``log1p(x + 1e-6)`` then global min-max to
**[-1, 1]**, and yields NHWC float32 images.  ``verify_dataset`` reproduces
the shape/NaN/Inf runtime checker (:279-296).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


class MapDataset:
    """Indexable dataset over an .npy map stack (NHWC output)."""

    def __init__(self, source, transform=None):
        maps = np.load(source) if isinstance(source, str) else np.asarray(source)
        self.global_min = float(np.min(maps))
        self.global_max = float(np.max(maps))
        log_maps = np.log1p(maps + 1e-6)
        self.log_global_min = float(np.min(log_maps))
        self.log_global_max = float(np.max(log_maps))
        if maps.ndim == 3:
            maps = maps[..., np.newaxis]
        self.maps = maps
        self.maps_shape = maps.shape
        self.transform = transform

    def __len__(self) -> int:
        return len(self.maps)

    def __getitem__(self, idx: int) -> np.ndarray:
        image = self.maps[idx].astype(np.float32)
        image = np.log1p(image + 1e-6)
        image = (
            2.0 * (image - self.log_global_min)
            / (self.log_global_max - self.log_global_min)
            - 1.0
        )
        if self.transform is not None:
            image = self.transform(image)
        return image.astype(np.float32)

    def getshapes(self) -> Tuple[int, ...]:
        return self.maps_shape


def verify_dataset(dataset: MapDataset, num_samples: int = 5) -> list:
    """Shape/NaN/Inf sanity checks (diffusion_utilities.py:279-296).

    Returns a list of warning strings (empty when clean)."""
    warnings = []
    sample = dataset[0]
    print("\nDataset Verification:")
    print(f"Single sample shape: {sample.shape}")
    print(f"Sample min: {sample.min():.4f}")
    print(f"Sample max: {sample.max():.4f}")
    for i in range(min(num_samples, len(dataset))):
        s = dataset[i]
        if not (s.ndim == 3 and s.shape[-1] == 1):
            warnings.append(f"Sample {i} has incorrect shape: {s.shape}")
        if np.isnan(s).any():
            warnings.append(f"Sample {i} contains NaN values")
        if np.isinf(s).any():
            warnings.append(f"Sample {i} contains infinite values")
    for w in warnings:
        print(f"Warning: {w}")
    return warnings
