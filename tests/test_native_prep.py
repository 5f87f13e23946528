"""Native (C++) host-prep library parity vs the numpy reference path."""

import numpy as np
import pytest

from camels_diffusion_model_tpu.data import native_prep
from camels_diffusion_model_tpu.data.pipeline import normalize_maps, resize_maps_np

pytestmark = pytest.mark.skipif(
    not native_prep.available(), reason="native library unavailable (no toolchain)"
)


def test_minmax():
    rs = np.random.RandomState(0)
    data = rs.randn(100, 33).astype(np.float32)
    lo, hi = native_prep.minmax_native(data)
    assert np.isclose(lo, data.min())
    assert np.isclose(hi, data.max())


def test_normalize_matches_numpy():
    rs = np.random.RandomState(1)
    raw = (rs.lognormal(0, 2, (8, 64, 64)) + 0.1).astype(np.float32)
    want = normalize_maps(raw, style="code").astype(np.float32)
    got = native_prep.normalize_maps_native(raw)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert np.isclose(got.min(), 0.0, atol=1e-6)
    assert np.isclose(got.max(), 1.0, atol=1e-6)


def test_normalize_nonpositive_input():
    raw = np.linspace(-5, 5, 256).reshape(1, 16, 16).astype(np.float32)
    want = normalize_maps(raw, style="code").astype(np.float32)
    got = native_prep.normalize_maps_native(raw)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_matches_numpy_and_torch_semantics():
    rs = np.random.RandomState(2)
    maps = rs.randn(4, 64, 64).astype(np.float32)
    want = resize_maps_np(maps, 16)
    got = native_prep.resize_maps_native(maps, 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_upsample():
    rs = np.random.RandomState(3)
    maps = rs.randn(2, 8, 8).astype(np.float32)
    want = resize_maps_np(maps, 32)
    got = native_prep.resize_maps_native(maps, 32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
