"""Tests: data pipeline normalization, parameter handling, split, batching."""

import numpy as np
import pytest

from camels_diffusion_model_tpu.data import (
    batch_iterator,
    load_camels_dataset,
    normalize_maps,
    normalize_params,
    synthetic_camels,
    train_test_split,
)


def test_normalize_maps_code_style():
    rs = np.random.RandomState(0)
    raw = np.abs(rs.lognormal(0, 2, (4, 16, 16))) + 0.1
    out = normalize_maps(raw, style="code")
    assert np.isclose(out.min(), 0.0) and np.isclose(out.max(), 1.0)
    assert np.all(np.isfinite(out))


def test_normalize_maps_handles_nonpositive():
    raw = np.linspace(-5, 5, 64).reshape(1, 8, 8)
    out = normalize_maps(raw, style="code")
    assert np.all(np.isfinite(out))
    assert np.isclose(out.min(), 0.0) and np.isclose(out.max(), 1.0)


def test_normalize_maps_variants():
    rs = np.random.RandomState(1)
    raw = np.abs(rs.lognormal(0, 1, (4, 8, 8))) + 0.1
    out_i = normalize_maps(raw, style="initial")
    assert out_i.min() >= -1.0 and out_i.max() <= 1.0
    out_b = normalize_maps(raw, style="big")
    assert np.isclose(out_b.min(), -1.0) and np.isclose(out_b.max(), 1.0)


def test_normalize_params_expand_and_truncate():
    params = np.arange(12, dtype=np.float64).reshape(2, 6)
    cond, pmin, pmax = normalize_params(params, n_maps=30, num_params=3)
    assert cond.shape == (30, 3)
    assert cond.min() >= 0.0 and cond.max() <= 1.0
    assert pmin.shape == (1, 6) and pmax.shape == (1, 6)
    # first 15 rows repeat row 0
    np.testing.assert_allclose(cond[:15], np.tile(cond[0], (15, 1)))


def test_normalize_params_pad():
    params = np.random.RandomState(0).rand(2, 2)
    cond, _, _ = normalize_params(params, n_maps=30, num_params=4)
    assert cond.shape == (30, 4)
    np.testing.assert_allclose(cond[:, 2:], 0.0)


def test_normalize_params_mismatch_asserts():
    params = np.random.RandomState(0).rand(2, 6)
    with pytest.raises(AssertionError):
        normalize_params(params, n_maps=31, num_params=6)


def test_normalize_params_single_index():
    params = np.random.RandomState(0).rand(2, 6)
    cond, _, _ = normalize_params(params, n_maps=30, num_params=1, param_index=4)
    full, _, _ = normalize_params(params, n_maps=30, num_params=6)
    np.testing.assert_allclose(cond[:, 0], full[:, 4])


def test_split_deterministic():
    a = train_test_split(100, 20, seed=42)
    b = train_test_split(100, 20, seed=42)
    np.testing.assert_array_equal(a[0], b[0])
    assert len(a[0]) == 80 and len(a[1]) == 20
    assert len(np.intersect1d(a[0], a[1])) == 0


def test_load_camels_dataset_end_to_end():
    maps, params = synthetic_camels(n_param_sets=4, maps_per_set=15, size=32, seed=0)
    ds = load_camels_dataset(
        maps, params, num_params=6, height=16, test_size=10, seed=42
    )
    assert ds.train_x.shape == (50, 16, 16, 1)
    assert ds.test_x.shape == (10, 16, 16, 1)
    assert ds.train_c.shape == (50, 6)
    assert ds.train_x.min() >= 0.0 and ds.train_x.max() <= 1.0
    assert ds.info["total"] == 60


def test_batch_iterator_covers_all():
    x = np.arange(10)[:, None].astype(np.float32)
    c = np.arange(10)[:, None].astype(np.float32)
    seen = []
    for bx, bc in batch_iterator(x, c, 3, shuffle=False):
        seen.extend(bx[:, 0].tolist())
    assert sorted(seen) == list(range(10))
    n_drop = sum(
        1 for _ in batch_iterator(x, c, 3, shuffle=False, drop_last=True)
    )
    assert n_drop == 3


def test_synthetic_params_in_ranges():
    _, params = synthetic_camels(n_param_sets=8, maps_per_set=2, size=16)
    assert params.shape == (8, 6)
    assert params[:, 0].min() >= 0.1 and params[:, 0].max() <= 0.5
