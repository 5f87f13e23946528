"""Pixel-PDF statistics for distribution comparison plots.

Compute part of the reference's ``compare_distributions``
(train_diffusion_paper.py:861-905): per-image density histograms over a shared
bin grid of width 0.01 spanning the joint min/max of both image sets, then the
mean and std PDF across images of each set.  Small metric op; runs host-side
in numpy for exact ``np.histogram`` semantics.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def pixel_pdf(images: np.ndarray, bins: np.ndarray) -> np.ndarray:
    """Per-image density histograms -> (n_images, n_bins-1)."""
    images = np.asarray(images)
    return np.stack(
        [np.histogram(img.ravel(), bins, density=True)[0] for img in images]
    )


def compare_pdf_stats(
    camels_images: np.ndarray,
    diffusion_images: np.ndarray,
    bin_delta: float = 0.01,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (bin_mid, orig_mean, orig_std, gen_mean, gen_std).

    Bin grid: ``arange(joint_min, joint_max + delta, delta)``
    (train_diffusion_paper.py:862-865)."""
    camels_images = np.asarray(camels_images)
    diffusion_images = np.asarray(diffusion_images)
    bin_max = max(camels_images.max(), diffusion_images.max())
    bin_min = min(camels_images.min(), diffusion_images.min())
    bins = np.arange(bin_min, bin_max + bin_delta, bin_delta)
    train_pdf = pixel_pdf(camels_images, bins)
    test_pdf = pixel_pdf(diffusion_images, bins)
    bin_mid = (bins[:-1] + bins[1:]) / 2.0
    return (
        bin_mid,
        train_pdf.mean(axis=0),
        train_pdf.std(axis=0),
        test_pdf.mean(axis=0),
        test_pdf.std(axis=0),
    )
