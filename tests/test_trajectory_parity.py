"""Full-chain sampler trajectory parity against the reference's torch loop.

The strongest "the machine matches" evidence (beyond per-layer and whole-model
single-forward parity, test_torch_interop.py): export this framework's weights
into the reference's own torch ``ContextUnet``, execute the reference's exact
sampling loop in torch — ``denoise_add_noise`` + the ``sample_ddpm`` body,
train_diffusion_paper.py:548-623, including its CFG combination at :600-606 —
with an injected per-step z sequence, run this framework's ``sample_ddpm``
(the jitted chunked ``lax.scan``) under the key chain that GENERATES that same
z sequence, and assert per-step state agreement to fp32 tolerance over the
whole trajectory, CFG on and off.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from camels_diffusion_model_tpu.diffusion import make_schedule, sample_ddpm
from camels_diffusion_model_tpu.models import ContextUnet
from camels_diffusion_model_tpu.utils.torch_interop import (
    export_to_torch_state_dict,
)

_REF = "/root/reference"

T = 60  # >=50 steps of drift accumulation, still fast on CPU
BATCH, HEIGHT, NFEAT, NCFEAT = 2, 16, 8, 3


@pytest.fixture(scope="module")
def ref_unet_cls():
    if not os.path.isdir(os.path.join(_REF, "code")):
        pytest.skip("reference not mounted")
    for p in (_REF, os.path.join(_REF, "code")):
        if p not in sys.path:
            sys.path.insert(0, p)
    from test_reference_parity import _stub_torchvision

    _stub_torchvision()
    try:
        from ContextUnet import ContextUnet as RefContextUnet
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference ContextUnet: {e}")
    return RefContextUnet


def _z_sequence(rng, timesteps, shape):
    """Replicate sample_ddpm's internal noise chain on the host.

    ``_run`` consumes the key left after ``rng, xkey, pkey = split(rng, 3)``;
    each scan step then does ``key, zkey, skey = split(key, 3)`` and draws
    ``z = normal(zkey, x.shape)`` with ``z = 0`` at the final step (i == 1)
    — chunk boundaries never re-split, so this chain is exact.
    """
    key = jax.random.split(rng, 3)[0]
    zs = []
    for i in range(timesteps, 0, -1):
        key, zkey, _skey = jax.random.split(key, 3)
        z = np.asarray(jax.random.normal(zkey, shape, jnp.float32))
        zs.append(z if i > 1 else np.zeros_like(z))
    return zs


def _torch_reference_loop(model, x0_nchw, params, timesteps, guide_w, zs):
    """The reference's sampling loop, executed in torch.

    Schedule: train_diffusion_paper.py:214-217.  Ancestral update
    (``denoise_add_noise``): :548-553.  CFG combination: :600-606.  Returns
    the full per-step trajectory (chronological), NCHW.
    """
    b_t = (0.02 - 1e-4) * torch.linspace(0, 1, timesteps + 1) + 1e-4
    a_t = 1 - b_t
    ab_t = torch.cumsum(a_t.log(), dim=0).exp()
    ab_t[0] = 1
    x = x0_nchw.clone()
    uncond = torch.zeros_like(params)
    traj = []
    with torch.no_grad():
        for step, i in enumerate(range(timesteps, 0, -1)):
            t = torch.tensor([i / timesteps])
            z = torch.from_numpy(
                np.ascontiguousarray(zs[step].transpose(0, 3, 1, 2))
            )
            if guide_w > 0:
                eps_cond = model(x, t, params)
                eps_uncond = model(x, t, uncond)
                eps = eps_uncond + guide_w * (eps_cond - eps_uncond)
            else:
                eps = model(x, t, params)
            mean = (
                x - eps * ((1 - a_t[i]) / (1 - ab_t[i]).sqrt())
            ) / a_t[i].sqrt()
            x = mean + b_t[i].sqrt() * z
            traj.append(x.numpy())
    return traj


@pytest.mark.parametrize("guide_w", [0.0, 2.0])
def test_full_chain_trajectory_parity(ref_unet_cls, monkeypatch, guide_w):
    from test_torch_interop import (
        _fixed_shortcut_ctx,
        _flax_vars_with_shortcut,
    )

    flax_model = ContextUnet(
        in_channels=1, n_feat=NFEAT, n_cfeat=NCFEAT, height=HEIGHT, levels=2
    )
    variables = flax_model.init(
        jax.random.PRNGKey(11),
        np.zeros((1, HEIGHT, HEIGHT, 1), np.float32),
        np.array([0.5], np.float32),
    )
    # Non-trivial BatchNorm running stats so the eval-mode normalization path
    # is genuinely exercised on both sides.
    rs = np.random.RandomState(5)
    variables = jax.device_get(variables)
    variables["batch_stats"] = jax.tree_util.tree_map_with_path(
        lambda path, leaf: (
            (rs.randn(*leaf.shape) * 0.1).astype(np.float32)
            if "mean" in jax.tree_util.keystr(path)
            else (rs.rand(*leaf.shape) + 0.5).astype(np.float32)
        ),
        variables["batch_stats"],
    )

    # Export into the reference's own torch ContextUnet (eval mode = the same
    # frozen-running-stats semantics the flax apply uses).
    sd_np = export_to_torch_state_dict(variables)
    torch_model = ref_unet_cls(
        in_channels=1, n_feat=NFEAT, n_cfeat=NCFEAT, height=HEIGHT
    )
    torch_model.load_state_dict(
        {
            k: torch.from_numpy(np.ascontiguousarray(v))
            if np.ndim(v)
            else torch.tensor(v)
            for k, v in sd_np.items()
        }
    )
    torch_model.eval()

    # Pin the reference's fresh-per-forward 1x1 shortcut to ONE fixed conv and
    # mirror it into the flax learned-shortcut slot (deterministic comparison;
    # same device as test_torch_interop's whole-model parity tests).
    fixed = tnn.Conv2d(1, NFEAT, 1)
    _fixed_shortcut_ctx(monkeypatch, fixed)
    variables = _flax_vars_with_shortcut(variables, fixed)

    rng = jax.random.PRNGKey(42)
    x0 = np.asarray(
        jax.random.normal(
            jax.random.PRNGKey(7), (BATCH, HEIGHT, HEIGHT, 1), jnp.float32
        )
    )
    params_np = np.random.RandomState(3).rand(BATCH, NCFEAT).astype(np.float32)

    zs = _z_sequence(rng, T, x0.shape)
    torch_traj = _torch_reference_loop(
        torch_model,
        torch.from_numpy(np.ascontiguousarray(x0.transpose(0, 3, 1, 2))),
        torch.from_numpy(params_np),
        T,
        guide_w,
        zs,
    )

    out = sample_ddpm(
        flax_model,
        variables,
        make_schedule(T),
        rng,
        n_sample=BATCH,
        size=HEIGHT,
        params=jnp.asarray(params_np),
        guide_w=guide_w,
        save_rate=1,  # capture EVERY step of the trajectory
        x_init=jnp.asarray(x0),
        measure_timing=False,
    )
    jax_traj = np.asarray(out.intermediate).transpose(0, 1, 4, 2, 3)
    assert jax_traj.shape[0] == T

    worst = 0.0
    for step in range(T):
        err = np.max(np.abs(jax_traj[step] - torch_traj[step]))
        worst = max(worst, float(err))
        np.testing.assert_allclose(
            jax_traj[step],
            torch_traj[step],
            atol=2e-5 + 1e-6 * step,  # measured drift ~4e-6 over 60 steps

            rtol=0,
            err_msg=f"trajectory diverged at reverse step {T - step} "
            f"(chronological index {step}, guide_w={guide_w})",
        )
    # Final states agree too (same check, explicit for the report).
    np.testing.assert_allclose(
        np.asarray(out.x).transpose(0, 3, 1, 2),
        torch_traj[-1],
        atol=2e-5 + 1e-6 * T,
        rtol=0,
    )
    print(f"max per-step |Δ| over {T} steps (guide_w={guide_w}): {worst:.2e}")
