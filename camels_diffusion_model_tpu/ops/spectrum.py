"""Isotropic 2-D/3-D power spectra on-device (batched TPU FFT).

The reference has TWO distinct power-spectrum implementations with different
binning semantics; both are reproduced here because both are used:

* :func:`power_spectrum` — linear k-bins of width ``dk = 2*pi/(min(dims)*dl)``
  over an orthonormal FFT, bin index ``rint(k/dk)``, empty bins left at zero,
  final scaling ``pk *= dl**ndims`` (reference:
  code/diffusion_utilities.py:302-368, a Python loop over every pixel).
* :func:`calculate_power_spectrum_2d` — 20 LOGARITHMIC bins from
  ``2*pi/(N*dl)`` to ``pi/dl`` over an unnormalized fftshifted FFT, where the
  k-grid is built from ``np.fft.fftfreq`` in cycle units (reference quirk: the
  bin range is in angular units, so most upper bins are empty and dropped);
  per-bin k-center is the mean k in the bin (code/sample_power_spectra.py:112-165).

TPU-first design: the k-grid and bin memberships depend only on the (static)
image shape and ``dl``, so they are precomputed on the host once per shape and
the per-image binning becomes a ``segment_sum`` / small matmul over the FFT
power — fully vectorized and vmapped over the batch, no Python loops.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Linear-bin spectrum (diffusion_utilities.py:302-368 semantics)
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _linear_bin_info(shape: Tuple[int, ...], dl: float):
    dims = shape
    ndims = len(dims)
    comps = [2 * np.pi * np.fft.fftfreq(d, dl) for d in dims]
    grids = np.meshgrid(*comps, indexing="ij")
    kgrid = np.sqrt(sum(g**2 for g in grids))
    dk = 2 * np.pi / (min(dims) * dl)
    k_max = kgrid.max()
    n_bins = int(np.ceil(k_max / dk)) + 1
    # Python round() is round-half-even on floats — np.rint matches.
    bin_idx = np.rint(kgrid / dk).astype(np.int64).ravel()
    # Guard against out-of-bounds exactly like the reference's
    # ``if bin_idx < n_bins`` (drop, don't clip).
    valid = bin_idx < n_bins
    bin_idx = np.where(valid, bin_idx, n_bins)  # overflow bucket n_bins
    count = np.bincount(bin_idx[valid], minlength=n_bins)[:n_bins]
    k_bins = np.arange(n_bins) * dk
    return jnp.asarray(bin_idx), count, n_bins, k_bins


@functools.lru_cache(maxsize=32)
def _linear_spectrum_fn(shape: Tuple[int, ...], dl: float, batched: bool):
    bin_idx, count, n_bins, _ = _linear_bin_info(shape, dl)
    ndims = len(shape)
    count_j = jnp.asarray(np.maximum(count, 1), jnp.float32)
    has_any = jnp.asarray(count > 0)

    def single(box):
        ft = jnp.fft.fftn(box, norm="ortho")
        power = jnp.abs(ft).astype(jnp.float32) ** 2
        sums = jax.ops.segment_sum(
            power.ravel(), bin_idx, num_segments=n_bins + 1
        )[:n_bins]
        pk = jnp.where(has_any, sums / count_j, 0.0)
        return pk * (dl**ndims)

    fn = jax.vmap(single) if batched else single
    return jax.jit(fn)


def power_spectrum(box, dl: float = 1.0):
    """Linear-bin isotropic P(k) of a single 2-D or 3-D box.

    Returns ``(k_bins, pk)`` with ``k_bins`` a host numpy array (static) and
    ``pk`` a device array.  Matches diffusion_utilities.py:302-368 exactly,
    including the k=0 bin and zero-valued empty bins.
    """
    box = jnp.asarray(box)
    if box.ndim not in (2, 3):
        raise ValueError("Input box must be 2D or 3D")
    *_, k_bins = _linear_bin_info(tuple(box.shape), float(dl))
    pk = _linear_spectrum_fn(tuple(box.shape), float(dl), False)(box)
    return k_bins, pk


def power_spectrum_batch(maps, dl: float = 1.0):
    """Per-image linear-bin P(k) of a batch (B, H, W) -> (k_bins, (B, n_bins))."""
    maps = jnp.asarray(maps)
    shape = tuple(maps.shape[1:])
    *_, k_bins = _linear_bin_info(shape, float(dl))
    pk = _linear_spectrum_fn(shape, float(dl), True)(maps)
    return k_bins, pk


# --------------------------------------------------------------------------
# Log-bin spectrum (sample_power_spectra.py:112-165 semantics)
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _log_bin_info(shape: Tuple[int, int], dl: float):
    nx, ny = shape
    kx = np.fft.fftshift(np.fft.fftfreq(nx, dl))
    ky = np.fft.fftshift(np.fft.fftfreq(ny, dl))
    kx2, ky2 = np.meshgrid(kx, ky, indexing="ij")
    k_flat = np.sqrt(kx2**2 + ky2**2).ravel()

    k_min = 2 * np.pi / (nx * dl)
    k_max = np.pi / dl
    k_bins = np.logspace(np.log10(k_min), np.log10(k_max), 20)

    rows = []
    k_centers = []
    for i in range(len(k_bins) - 1):
        mask = (k_flat >= k_bins[i]) & (k_flat < k_bins[i + 1])
        n = mask.sum()
        if n > 0:
            rows.append(mask.astype(np.float32) / n)
            k_centers.append(k_flat[mask].mean())
    bin_matrix = np.stack(rows) if rows else np.zeros((0, k_flat.size), np.float32)
    return jnp.asarray(bin_matrix), np.asarray(k_centers)


@functools.lru_cache(maxsize=32)
def _log_spectrum_fn(shape: Tuple[int, int], dl: float, batched: bool):
    bin_matrix, _ = _log_bin_info(shape, dl)

    def single(image):
        ft = jnp.fft.fftshift(jnp.fft.fft2(image))
        power = (jnp.abs(ft).astype(jnp.float32) ** 2).ravel()
        return bin_matrix @ power

    fn = jax.vmap(single) if batched else single
    return jax.jit(fn)


def calculate_power_spectrum_2d(image, dl: float = 1.0):
    """Log-bin 2-D P(k) of one image -> (k_centers, pk).

    Matches sample_power_spectra.py:112-165 exactly (including the
    cycle-vs-angular frequency quirk that drops the upper bins)."""
    image = jnp.asarray(image)
    _, k_centers = _log_bin_info(tuple(image.shape), float(dl))
    pk = _log_spectrum_fn(tuple(image.shape), float(dl), False)(image)
    return k_centers, pk


def calculate_power_spectrum_2d_batch(maps, dl: float = 1.0):
    """Batched log-bin P(k): (B, H, W) -> (k_centers, (B, n_kept))."""
    maps = jnp.asarray(maps)
    shape = tuple(maps.shape[1:])
    _, k_centers = _log_bin_info(shape, float(dl))
    pk = _log_spectrum_fn(shape, float(dl), True)(maps)
    return k_centers, pk


def compare_power_spectra(
    original_images,
    generated_images,
    output_dir: str,
    dl: float = 1.0,
    title: str = "Power Spectrum Comparison",
):
    """Full compare-and-plot convenience (diffusion_utilities.py:370-448
    contract): per-image linear-bin spectra of both batches, mean±std
    log-log figure saved to ``output_dir/power_spectrum_comparison.png``,
    returns ``(k, orig_pk_mean, gen_pk_mean)``.

    Accepts (B, H, W) or NHWC batches.
    """
    import numpy as _np

    def _bhw(a):
        a = _np.asarray(a)
        return a[..., 0] if a.ndim == 4 else a

    k, om, os_, gm, gs = compare_power_spectra_stats(
        _bhw(original_images), _bhw(generated_images), dl
    )
    from ..utils import viz

    viz.plot_power_spectrum_comparison(
        k, om, os_, gm, gs, output_dir, title=title
    )
    return k, om, gm


def compare_power_spectra_stats(original_maps, generated_maps, dl: float = 1.0):
    """Mean/std per-image linear-bin spectra of two batches
    (compute part of diffusion_utilities.py:370-448).

    Returns (k, orig_mean, orig_std, gen_mean, gen_std) as numpy arrays.
    """
    k, orig_pk = power_spectrum_batch(original_maps, dl)
    _, gen_pk = power_spectrum_batch(generated_maps, dl)
    orig_pk = np.asarray(orig_pk)
    gen_pk = np.asarray(gen_pk)
    return (
        k,
        orig_pk.mean(axis=0),
        orig_pk.std(axis=0),
        gen_pk.mean(axis=0),
        gen_pk.std(axis=0),
    )
