"""Direct numerical parity against the REFERENCE implementation itself.

These tests import the reference's modules read-only from /root/reference
(skipped when that checkout is absent, e.g. on CI) and compare this
framework's outputs against the reference's own functions on identical
inputs — the strongest form of parity evidence for the pure-numpy components.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "code")), reason="reference not mounted"
)


def _stub_torchvision():
    """The reference imports torchvision (absent here) for image saving only;
    stub the handful of names so its numeric functions are importable."""
    import types

    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    utils = types.ModuleType("torchvision.utils")
    utils.save_image = lambda *a, **k: None
    utils.make_grid = lambda x, *a, **k: x
    transforms = types.ModuleType("torchvision.transforms")
    transforms.Compose = lambda fns: (lambda x: x)
    transforms.Lambda = lambda fn: fn
    tv.utils = utils
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.utils"] = utils
    sys.modules["torchvision.transforms"] = transforms


@pytest.fixture(scope="module")
def ref_utils():
    sys.path.insert(0, os.path.join(REF, "code"))
    _stub_torchvision()
    try:
        import diffusion_utilities as du
    except Exception as e:
        pytest.skip(f"cannot import reference utilities: {e}")
    return du


def test_linear_power_spectrum_parity(ref_utils):
    from camels_diffusion_model_tpu.ops.spectrum import power_spectrum

    rs = np.random.RandomState(0)
    for shape in [(16, 16), (64, 64), (8, 8, 8)]:
        box = rs.randn(*shape)
        k_ref, pk_ref = ref_utils.power_spectrum(box, dl=1.0)
        k_got, pk_got = power_spectrum(box, dl=1.0)
        np.testing.assert_allclose(k_got, k_ref, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(pk_got), pk_ref, rtol=1e-4, atol=1e-7
        )


def test_log_power_spectrum_parity():
    sys.path.insert(0, os.path.join(REF, "code"))
    _stub_torchvision()
    try:
        import sample_power_spectra as sps
    except Exception as e:
        pytest.skip(f"cannot import reference sampler module: {e}")
    from camels_diffusion_model_tpu.ops.spectrum import calculate_power_spectrum_2d

    rs = np.random.RandomState(1)
    img = rs.randn(64, 64)
    k_ref, pk_ref = sps.calculate_power_spectrum_2d(img, dl=1.0)
    k_got, pk_got = calculate_power_spectrum_2d(img, dl=1.0)
    np.testing.assert_allclose(k_got, k_ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pk_got), pk_ref, rtol=1e-4)


def test_unorm_norm_all_parity(ref_utils):
    from camels_diffusion_model_tpu.utils import norm_all, unorm

    rs = np.random.RandomState(2)
    x = rs.randn(8, 8, 3)
    np.testing.assert_allclose(unorm(x), ref_utils.unorm(x), rtol=1e-6)
    store = rs.randn(3, 2, 8, 8, 3)
    np.testing.assert_allclose(
        norm_all(store, 3, 2), ref_utils.norm_all(store, 3, 2), rtol=1e-6
    )


def test_gen_tst_context_parity(ref_utils):
    from camels_diffusion_model_tpu.utils import gen_tst_context

    n_ref, vec_ref = ref_utils.gen_tst_context(5)
    n_got, vec_got = gen_tst_context(5)
    assert n_got == n_ref
    np.testing.assert_array_equal(vec_got, vec_ref.numpy())


def test_map_normalization_parity():
    """The 'code'-style recipe reproduces the reference's inline pipeline
    (train_diffusion_paper.py:254-260) bit-for-bit in float64."""
    from camels_diffusion_model_tpu.data import normalize_maps

    rs = np.random.RandomState(3)
    camels_data = np.abs(rs.lognormal(0, 2, (6, 32, 32))) + 0.05

    ref = camels_data.copy()
    min_value = np.min(ref)
    if min_value <= 0:
        ref = ref - min_value + 1e-8
    ref = ref / np.max(ref)
    ref = np.log10(ref)
    ref = (ref - ref.min()) / (ref.max() - ref.min())

    got = normalize_maps(camels_data, style="code")
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_schedule_parity_vs_torch():
    """Schedule matches the reference's torch construction
    (train_diffusion_paper.py:214-217) to fp32 precision."""
    torch = pytest.importorskip("torch")
    from camels_diffusion_model_tpu import make_schedule

    T = 1500
    beta1, beta2 = 1e-4, 0.02
    b_t = (beta2 - beta1) * torch.linspace(0, 1, T + 1) + beta1
    a_t = 1 - b_t
    ab_t = torch.cumsum(a_t.log(), dim=0).exp()
    ab_t[0] = 1
    sched = make_schedule(T, beta1, beta2)
    np.testing.assert_allclose(np.asarray(sched.beta), b_t.numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sched.alpha_bar), ab_t.numpy(), rtol=1e-5, atol=1e-7
    )
