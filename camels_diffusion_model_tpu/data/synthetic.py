"""Synthetic CAMELS-like data for tests, smoke runs, and benchmarks.

The reference's real inputs (``Maps_HI_IllustrisTNG_LH_z=0.00.npy``,
15000x256x256, and ``params.npy`` 1000x6 — README.md:45-60) are stored in git
LFS and are not present in the checkout, so this module generates
statistically similar stand-ins: lognormal Gaussian random fields whose power
spectrum amplitude/slope depend on the first two "cosmological" parameters.
This gives the full pipeline (normalization, conditioning, power-spectrum
validation) something physically meaningful to chew on without the dataset.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# CAMELS LH parameter ranges (README.md:54-60 order):
# Omega_m, sigma_8, A_SN1, A_AGN1, A_SN2, A_AGN2
PARAM_RANGES = np.array(
    [
        [0.1, 0.5],
        [0.6, 1.0],
        [0.25, 4.0],
        [0.25, 4.0],
        [0.5, 2.0],
        [0.25, 4.0],
    ]
)


def synthetic_camels(
    n_param_sets: int = 16,
    maps_per_set: int = 15,
    size: int = 256,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Generate (maps (n_sets*maps_per_set, size, size), params (n_sets, 6)).

    Maps are positive (HI-column-density-like, heavy-tailed) so the
    log10-based normalization recipes apply unchanged.
    """
    rng = np.random.default_rng(seed)
    params = rng.uniform(
        PARAM_RANGES[:, 0], PARAM_RANGES[:, 1], size=(n_param_sets, 6)
    )

    kx = np.fft.fftfreq(size)[:, None]
    ky = np.fft.fftfreq(size)[None, :]
    k = np.sqrt(kx**2 + ky**2)
    k[0, 0] = 1.0  # avoid div-by-zero; DC handled below

    maps = np.empty((n_param_sets * maps_per_set, size, size), np.float32)
    for i, p in enumerate(params):
        # Spectrum shape driven by the "cosmology": amplitude from sigma_8,
        # slope from Omega_m.  Purely synthetic but parameter-sensitive.
        slope = 1.5 + 2.0 * (p[0] - 0.1) / 0.4
        amp = 0.5 + 2.0 * (p[1] - 0.6) / 0.4
        pk = amp * k ** (-slope)
        pk[0, 0] = 0.0
        for j in range(maps_per_set):
            white = rng.normal(size=(size, size))
            field = np.fft.ifft2(np.fft.fft2(white) * np.sqrt(pk)).real
            field = field / (field.std() + 1e-12)
            maps[i * maps_per_set + j] = np.exp(1.5 * field).astype(np.float32)
    return maps, params
