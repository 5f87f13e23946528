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
    (modulo the documented init_conv shortcut, which import re-seeds with ONE
    fixed Kaiming-uniform draw from PRNGKey(shortcut_seed))."""
    model, variables = tiny_model_and_vars
    path = str(tmp_path / "model.pth")
    save_torch_checkpoint(variables, path)
    restored = load_torch_checkpoint(variables, path)

    # Align the (reference-absent) shortcut before comparing forwards.
    import copy

    aligned = copy.deepcopy(jax.device_get(variables))
    aligned["params"]["init_conv"]["shortcut"] = jax.device_get(
        restored["params"]["init_conv"]["shortcut"]
    )
    x = np.random.RandomState(0).randn(2, 16, 16, 1).astype(np.float32)
    c = np.random.RandomState(1).rand(2, 3).astype(np.float32)
    t = np.array([0.5], np.float32)
    a = model.apply(aligned, x, t, c)
    b = model.apply(restored, x, t, c)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_torch_free_pth_loader_matches_torch(tiny_model_and_vars, tmp_path):
    """The torch-free zip unpickler decodes a real ``torch.save(state_dict)``
    file identically to ``torch.load`` (keys, shapes, values) — this is the
    fallback that keeps reference ``.pth`` loading alive without torch."""
    import torch

    from camels_diffusion_model_tpu.utils.torch_interop import (
        _load_pth_without_torch,
    )

    model, variables = tiny_model_and_vars
    path = str(tmp_path / "model.pth")
    save_torch_checkpoint(variables, path)
    via_torch = {k: np.asarray(v) for k, v in torch.load(
        path, map_location="cpu", weights_only=True).items()}
    via_free = _load_pth_without_torch(path)
    assert set(via_free) == set(via_torch)
    for k in via_torch:
        np.testing.assert_array_equal(via_free[k], via_torch[k], err_msg=k)


def test_import_shortcut_is_template_independent(tiny_model_and_vars, tmp_path):
    """Two imports of the SAME .pth from DIFFERENT templates give identical
    models (the shortcut comes from PRNGKey(shortcut_seed), not the template)."""
    model, variables = tiny_model_and_vars
    path = str(tmp_path / "model.pth")
    save_torch_checkpoint(variables, path)
    other_template = model.init(
        jax.random.PRNGKey(123),
        np.zeros((1, 16, 16, 1), np.float32),
        np.array([0.5], np.float32),
    )
    r1 = load_torch_checkpoint(variables, path)
    r2 = load_torch_checkpoint(other_template, path)
    for a, b in zip(
        jax.tree_util.tree_leaves(r1), jax.tree_util.tree_leaves(r2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Whole-model parity against the reference's own torch ContextUnet
# (/root/reference/ContextUnet.py:5-60).  The reference model's init_conv
# draws a FRESH random 1x1 shortcut inside forward() (diffusion_utilities
# .py:54); the test pins one fixed conv for the torch side and copies its
# weights into the flax learned-shortcut slot so the comparison is exact.
# Scope note: interop covers the canonical architecture only — the deep/big
# variants exist solely inside the reference's root-level training scripts
# (initial.py/main.py, not importable modules) and the reference ships no
# loadable .pth for them.
# ---------------------------------------------------------------------------

import os as _os
import sys as _sys

_REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_torch_model():
    if not _os.path.isdir(_os.path.join(_REF, "code")):
        pytest.skip("reference not mounted")
    for p in (_REF, _os.path.join(_REF, "code")):
        if p not in _sys.path:
            _sys.path.insert(0, p)
    # reference code imports torchvision (absent); reuse the parity-test stub
    from test_reference_parity import _stub_torchvision

    _stub_torchvision()
    try:
        from ContextUnet import ContextUnet as RefContextUnet
    except Exception as e:
        pytest.skip(f"cannot import reference ContextUnet: {e}")
    torch.manual_seed(0)
    model = RefContextUnet(in_channels=1, n_feat=128, n_cfeat=6, height=64)
    model.eval()
    # make BatchNorm running stats non-trivial so folding/normalization paths
    # are genuinely exercised
    gen = torch.Generator().manual_seed(1)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean = torch.randn(m.running_mean.shape, generator=gen) * 0.1
            m.running_var = torch.rand(m.running_var.shape, generator=gen) + 0.5
    return model


def _fixed_shortcut_ctx(monkeypatch, fixed):
    """During torch forward, the fresh 1x1 shortcut conv is replaced by ONE
    fixed instance (deterministic whole-model comparison)."""
    real = tnn.Conv2d

    def fake(in_c, out_c, kernel_size=3, *a, **kw):
        if kernel_size == 1 and in_c == fixed.in_channels:
            return fixed
        return real(in_c, out_c, kernel_size, *a, **kw)

    monkeypatch.setattr(torch.nn, "Conv2d", fake)


def _flax_vars_with_shortcut(variables, fixed):
    """Copy the fixed torch 1x1 conv into the flax learned-shortcut slot."""
    import copy

    v = copy.deepcopy(jax.device_get(variables))
    sc = v["params"]["init_conv"]["shortcut"]
    sc["kernel"] = (
        fixed.weight.detach().numpy().transpose(2, 3, 1, 0).astype(np.float32)
    )
    sc["bias"] = fixed.bias.detach().numpy().astype(np.float32)
    return v


def test_whole_model_forward_parity_import(ref_torch_model, monkeypatch):
    """Import a torch state_dict -> flax forward == torch forward (fp32)."""
    flax_model = ContextUnet(
        in_channels=1, n_feat=128, n_cfeat=6, height=64, levels=2
    )
    template = flax_model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 64, 64, 1), np.float32),
        np.array([0.5], np.float32),
    )
    sd = {k: v for k, v in ref_torch_model.state_dict().items()}
    variables = import_from_torch_state_dict(template, sd)

    torch.manual_seed(2)
    x_t = torch.randn(2, 1, 64, 64)
    t_t = torch.tensor([0.37])
    c_t = torch.rand(2, 6)
    fixed = tnn.Conv2d(1, 128, 1)
    _fixed_shortcut_ctx(monkeypatch, fixed)
    with torch.no_grad():
        want = ref_torch_model(x_t, t_t, c_t).numpy()

    variables = _flax_vars_with_shortcut(variables, fixed)
    got = np.asarray(
        flax_model.apply(
            variables,
            x_t.numpy().transpose(0, 2, 3, 1),
            t_t.numpy(),
            c_t.numpy(),
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_whole_model_forward_parity_export(ref_torch_model, monkeypatch, tmp_path):
    """Export flax-trained weights -> a torch reference model forward matches
    the flax forward (the reverse interop direction)."""
    if not _os.path.isdir(_os.path.join(_REF, "code")):
        pytest.skip("reference not mounted")
    from ContextUnet import ContextUnet as RefContextUnet

    flax_model = ContextUnet(
        in_channels=1, n_feat=128, n_cfeat=6, height=64, levels=2
    )
    variables = flax_model.init(
        jax.random.PRNGKey(3),
        np.zeros((1, 64, 64, 1), np.float32),
        np.array([0.5], np.float32),
    )
    sd_np = export_to_torch_state_dict(variables)
    torch_model = RefContextUnet(in_channels=1, n_feat=128, n_cfeat=6, height=64)
    torch_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) if np.ndim(v)
         else torch.tensor(v) for k, v in sd_np.items()}
    )
    torch_model.eval()

    rs = np.random.RandomState(4)
    x = rs.randn(2, 64, 64, 1).astype(np.float32)
    t = np.array([0.8], np.float32)
    c = rs.rand(2, 6).astype(np.float32)
    fixed = tnn.Conv2d(1, 128, 1)
    _fixed_shortcut_ctx(monkeypatch, fixed)
    with torch.no_grad():
        want = torch_model(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(t),
            torch.from_numpy(c),
        ).numpy()
    got = np.asarray(
        flax_model.apply(_flax_vars_with_shortcut(variables, fixed), x, t, c)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
