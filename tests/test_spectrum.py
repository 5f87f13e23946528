"""Tests: power spectra vs independent numpy oracles."""

import numpy as np
import pytest

from camels_diffusion_model_tpu.ops.spectrum import (
    calculate_power_spectrum_2d,
    calculate_power_spectrum_2d_batch,
    power_spectrum,
    power_spectrum_batch,
)


def _oracle_linear(box, dl=1.0):
    """Independent transcription of the linear-bin algorithm
    (diffusion_utilities.py:302-368 semantics)."""
    dims = box.shape
    nd = len(dims)
    ft = np.fft.fftn(box, norm="ortho")
    comps = [2 * np.pi * np.fft.fftfreq(d, dl) for d in dims]
    grids = np.meshgrid(*comps, indexing="ij")
    kgrid = np.sqrt(sum(g**2 for g in grids))
    dk = 2 * np.pi / (min(dims) * dl)
    n_bins = int(np.ceil(kgrid.max() / dk)) + 1
    pk = np.zeros(n_bins)
    count = np.zeros(n_bins)
    for kv, pv in zip(kgrid.ravel(), (np.abs(ft) ** 2).ravel()):
        b = int(round(kv / dk))
        if b < n_bins:
            pk[b] += pv
            count[b] += 1
    valid = count > 0
    pk[valid] /= count[valid]
    pk *= dl**nd
    return np.arange(n_bins) * dk, pk


def _oracle_log(image, dl=1.0):
    """Independent transcription of the log-bin algorithm
    (sample_power_spectra.py:112-165 semantics)."""
    nx, ny = image.shape
    ft = np.fft.fftshift(np.fft.fft2(image))
    power = np.abs(ft) ** 2
    kx = np.fft.fftshift(np.fft.fftfreq(nx, dl))
    ky = np.fft.fftshift(np.fft.fftfreq(ny, dl))
    kx2, ky2 = np.meshgrid(kx, ky, indexing="ij")
    k = np.sqrt(kx2**2 + ky2**2).ravel()
    p = power.ravel()
    bins = np.logspace(np.log10(2 * np.pi / (nx * dl)), np.log10(np.pi / dl), 20)
    kc, pk = [], []
    for i in range(len(bins) - 1):
        m = (k >= bins[i]) & (k < bins[i + 1])
        if m.sum() > 0:
            kc.append(k[m].mean())
            pk.append(p[m].mean())
    return np.array(kc), np.array(pk)


@pytest.mark.parametrize("shape", [(16, 16), (32, 16)])
def test_linear_spectrum_matches_oracle(shape):
    rs = np.random.RandomState(0)
    box = rs.randn(*shape).astype(np.float64)
    k_want, pk_want = _oracle_linear(box)
    k_got, pk_got = power_spectrum(box)
    np.testing.assert_allclose(k_got, k_want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pk_got), pk_want, rtol=1e-4, atol=1e-7)


def test_linear_spectrum_3d():
    rs = np.random.RandomState(1)
    box = rs.randn(8, 8, 8)
    k_want, pk_want = _oracle_linear(box)
    k_got, pk_got = power_spectrum(box)
    np.testing.assert_allclose(np.asarray(pk_got), pk_want, rtol=1e-4, atol=1e-7)


def test_linear_spectrum_sine_peak():
    """A pure sine along one axis concentrates power at its wavenumber bin."""
    n = 32
    x = np.arange(n)
    img = np.sin(2 * np.pi * 4 * x / n)[None, :].repeat(n, axis=0)
    k, pk = power_spectrum(img)
    pk = np.asarray(pk)
    dk = 2 * np.pi / n
    k_signal = 2 * np.pi * 4 / n
    peak_bin = int(round(k_signal / dk))
    assert pk.argmax() == peak_bin


def test_linear_batch_consistent():
    rs = np.random.RandomState(2)
    maps = rs.randn(3, 16, 16)
    k, pk_b = power_spectrum_batch(maps)
    for i in range(3):
        _, pk_i = power_spectrum(maps[i])
        np.testing.assert_allclose(np.asarray(pk_b[i]), np.asarray(pk_i), rtol=1e-5)


@pytest.mark.parametrize("n", [16, 64])
def test_log_spectrum_matches_oracle(n):
    rs = np.random.RandomState(3)
    img = rs.randn(n, n)
    k_want, pk_want = _oracle_log(img)
    k_got, pk_got = calculate_power_spectrum_2d(img)
    np.testing.assert_allclose(k_got, k_want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pk_got), pk_want, rtol=1e-4)


def test_log_batch_consistent():
    rs = np.random.RandomState(4)
    maps = rs.randn(4, 16, 16)
    k, pk_b = calculate_power_spectrum_2d_batch(maps)
    for i in range(4):
        _, pk_i = calculate_power_spectrum_2d(maps[i])
        # vmapped vs single differ only by fp32 accumulation order
        np.testing.assert_allclose(np.asarray(pk_b[i]), np.asarray(pk_i), rtol=1e-2)


def test_linear_spectrum_dl_scaling():
    """Physical spacing dl rescales k and P(k) per the reference's formulas."""
    rs = np.random.RandomState(7)
    box = rs.randn(16, 16)
    k1, p1 = _oracle_linear(box, dl=2.0)
    k2, p2 = power_spectrum(box, dl=2.0)
    np.testing.assert_allclose(k2, k1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p2), p1, rtol=1e-4, atol=1e-7)
