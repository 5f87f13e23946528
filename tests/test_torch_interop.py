"""Torch .pth interop: per-layer numerical parity and full round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from camels_diffusion_model_tpu.models import ContextUnet
from camels_diffusion_model_tpu.utils.torch_interop import (
    _to_flax,
    _to_torch,
    export_to_torch_state_dict,
    import_from_torch_state_dict,
    load_torch_checkpoint,
    save_torch_checkpoint,
)


def test_conv2d_layout_parity():
    """torch Conv2d(3x3, pad 1) == flax Conv with converted kernel."""
    rs = np.random.RandomState(0)
    x = rs.randn(2, 8, 8, 4).astype(np.float32)
    tconv = tnn.Conv2d(4, 6, 3, 1, 1)
    w = tconv.weight.detach().numpy()
    b = tconv.bias.detach().numpy()
    want = (
        tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        .detach()
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    fconv = nn.Conv(6, kernel_size=(3, 3), padding="SAME")
    got = fconv.apply(
        {"params": {"kernel": jnp.asarray(_to_flax(w, "conv")), "bias": jnp.asarray(b)}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k", [2, 4])
def test_conv_transpose_layout_parity(k):
    """torch ConvTranspose2d(k, stride=k) == flax ConvTranspose with
    converted (spatially flipped) kernel."""
    rs = np.random.RandomState(0)
    x = rs.randn(2, 4, 4, 3).astype(np.float32)
    tconv = tnn.ConvTranspose2d(3, 5, k, k)
    w = tconv.weight.detach().numpy()
    b = tconv.bias.detach().numpy()
    want = (
        tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        .detach()
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    fconv = nn.ConvTranspose(5, kernel_size=(k, k), strides=(k, k))
    got = fconv.apply(
        {
            "params": {
                "kernel": jnp.asarray(np.ascontiguousarray(_to_flax(w, "convT"))),
                "bias": jnp.asarray(b),
            }
        },
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_linear_layout_parity():
    rs = np.random.RandomState(0)
    x = rs.randn(3, 4).astype(np.float32)
    tlin = tnn.Linear(4, 6)
    w = tlin.weight.detach().numpy()
    b = tlin.bias.detach().numpy()
    want = tlin(torch.from_numpy(x)).detach().numpy()
    got = nn.Dense(6).apply(
        {"params": {"kernel": jnp.asarray(_to_flax(w, "linear")), "bias": jnp.asarray(b)}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_layout_roundtrip():
    rs = np.random.RandomState(0)
    for kind, shape in [("conv", (6, 4, 3, 3)), ("convT", (4, 6, 2, 2)), ("linear", (6, 4))]:
        arr = rs.randn(*shape).astype(np.float32)
        back = _to_torch(_to_flax(arr, kind), kind)
        np.testing.assert_array_equal(back, arr)


def test_export_key_set_matches_reference_architecture(tiny_model_and_vars):
    """Exported state dict has exactly the reference ContextUnet's parameter
    names (train_diffusion_paper.py:16-47 module structure)."""
    _, variables = tiny_model_and_vars
    sd = export_to_torch_state_dict(variables)
    keys = set(sd.keys())
    # Spot-check canonical names
    for k in [
        "init_conv.conv1.0.weight",
        "init_conv.conv2.1.running_var",
        "down1.model.0.conv1.0.weight",
        "down2.model.1.conv2.1.bias",
        "timeembed1.model.0.weight",
        "contextembed2.model.2.bias",
        "up0.0.weight",
        "up0.1.weight",
        "up1.model.0.weight",
        "up1.model.2.conv2.1.running_mean",
        "out.0.weight",
        "out.1.bias",
        "out.3.weight",
    ]:
        assert k in keys, k
    # No framework-private names leak out
    assert not any("shortcut" in k for k in keys)
    assert not any("kernel" in k for k in keys)


def test_full_roundtrip_preserves_forward(tiny_model_and_vars, tmp_path):
    """export -> .pth -> import reproduces the model function exactly
    (modulo the documented init_conv shortcut, which import keeps from the
    template)."""
    model, variables = tiny_model_and_vars
    path = str(tmp_path / "model.pth")
    save_torch_checkpoint(variables, path)
    restored = load_torch_checkpoint(variables, path)

    x = np.random.RandomState(0).randn(2, 16, 16, 1).astype(np.float32)
    c = np.random.RandomState(1).rand(2, 3).astype(np.float32)
    t = np.array([0.5], np.float32)
    a = model.apply(variables, x, t, c)
    b = model.apply(restored, x, t, c)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
