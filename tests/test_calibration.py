"""Spectral calibration: fit + radial Fourier filter (diffusion/calibration.py).

The calibrated serving path multiplies each sampled map's FFT by
g(|k|) = r_fit(|k|)^(-1/2) so the mean P(k) lands on the exact-chain
reference's.  These tests pin the exactness of the power scaling, the fit's
noise rejection, DC preservation, and the save/load round trip.
"""

import numpy as np
import pytest

from camels_diffusion_model_tpu.diffusion.calibration import (
    SpectralCalibration,
    apply_spectral_calibration,
    fit_spectral_transfer,
)
from camels_diffusion_model_tpu.ops.spectrum import (
    power_spectrum_batch,
)
from camels_diffusion_model_tpu.ops.spectrum import _linear_bin_info


def _flat_calib(ratio, k_max=10.0):
    return SpectralCalibration(
        coeffs=(float(ratio),), k_min=0.01, k_max=k_max, clip=(0.1, 10.0)
    )


def test_identity_calibration_is_noop():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 16, 16)).astype(np.float32)
    out = apply_spectral_calibration(x, _flat_calib(1.0))
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-5)


def test_constant_ratio_scales_power_exactly():
    # r(k) = 4 everywhere => amplitudes halve => P(k) / 4, mean preserved.
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 32, 32)).astype(np.float32) + 5.0
    out = np.asarray(apply_spectral_calibration(x, _flat_calib(4.0)))
    k, pk_in = power_spectrum_batch(x)
    _, pk_out = power_spectrum_batch(out)
    pk_in, pk_out = np.asarray(pk_in), np.asarray(pk_out)
    good = (k > 0) & (pk_in.mean(0) > 0)
    np.testing.assert_allclose(
        pk_out.mean(0)[good], pk_in.mean(0)[good] / 4.0, rtol=1e-4
    )
    # DC (map mean) untouched
    np.testing.assert_allclose(out.mean(axis=(1, 2)), x.mean(axis=(1, 2)),
                               rtol=1e-5)


def test_nhwc_shape_and_dtype_preserved():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
    out = apply_spectral_calibration(x, _flat_calib(2.0))
    assert out.shape == x.shape
    assert out.dtype == x.dtype
    # channel-last layout handled: same result as squeezing to BHW
    out3 = apply_spectral_calibration(x[..., 0], _flat_calib(2.0))
    np.testing.assert_allclose(
        np.asarray(out)[..., 0], np.asarray(out3), atol=1e-5
    )


def test_smooth_ratio_corrected_on_spectrum():
    # Build maps, apply a KNOWN smooth spectral distortion, fit the ratio
    # from measured spectra, and check calibration undoes the distortion.
    rng = np.random.default_rng(3)
    ref = rng.normal(size=(64, 64, 64)).astype(np.float32)
    distort = SpectralCalibration(coeffs=(-0.01, 0.08, 0.95), k_min=0.0,
                                  k_max=10.0)
    # apply r^{-1/2} of the DISTORT ratio => fast maps have P*_k = P/r
    fast = np.asarray(apply_spectral_calibration(ref, distort))

    k, pk_ref = power_spectrum_batch(ref)
    _, pk_fast = power_spectrum_batch(fast)
    k = np.asarray(k)
    pk_ref = np.asarray(pk_ref).mean(0)
    pk_fast = np.asarray(pk_fast).mean(0)
    _, counts, _, _ = _linear_bin_info((64, 64), 1.0)

    calib = fit_spectral_transfer(k, pk_fast, pk_ref, deg=4, counts=counts)
    fixed = np.asarray(apply_spectral_calibration(fast, calib))
    _, pk_fixed = power_spectrum_batch(fixed)
    pk_fixed = np.asarray(pk_fixed).mean(0)

    good = (k > 0) & (pk_ref > 0)
    err_before = np.abs(pk_fast[good] / pk_ref[good] - 1).max()
    err_after = np.abs(pk_fixed[good] / pk_ref[good] - 1).max()
    assert err_before > 0.02          # the distortion was real
    assert err_after < err_before / 10  # and the fit removed it


def test_fit_rejects_per_bin_noise():
    # Noisy per-bin ratios around a smooth curve: the fitted ratio must be
    # closer to the true smooth curve than the raw noisy bins are.
    rng = np.random.default_rng(4)
    k = np.linspace(0.1, 4.4, 45)
    true_r = 1.0 - 0.03 * np.exp(-((k - 1.0) ** 2)) + 0.01 * (k / 4.4) ** 2
    counts = np.maximum((k / k[0]) ** 1.5, 6).astype(int)
    noisy_r = true_r * (1 + rng.normal(size=k.size) * np.sqrt(2.0 / counts) / 4)
    pk_ref = np.exp(-k)  # arbitrary positive reference
    calib = fit_spectral_transfer(k, noisy_r * pk_ref, pk_ref, deg=6,
                                  counts=counts)
    fit_err = np.abs(calib.ratio(k) - true_r).max()
    raw_err = np.abs(noisy_r - true_r).max()
    assert fit_err < raw_err


def test_save_load_roundtrip(tmp_path):
    calib = SpectralCalibration(coeffs=(0.002, -0.01, 1.03), k_min=0.1,
                                k_max=4.4, dl=1.0, clip=(0.8, 1.3))
    p = str(tmp_path / "calib.npz")
    calib.save(p)
    back = SpectralCalibration.load(p)
    assert back == calib
    kk = np.linspace(0.0, 5.0, 17)
    np.testing.assert_allclose(back.ratio(kk), calib.ratio(kk))


def test_ratio_clamped_outside_fit_range():
    calib = SpectralCalibration(coeffs=(1.0, 0.0), k_min=1.0, k_max=2.0,
                                clip=(0.9, 1.1))
    # r(k)=k on [1,2]; below/above the range evaluation clamps k
    assert calib.ratio(0.0) == pytest.approx(1.0)   # k clamped to 1
    assert calib.ratio(5.0) == pytest.approx(1.1)   # k->2 then clip 1.1
