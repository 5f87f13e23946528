"""Inference-only power-spectrum validation (sample_power_spectra.py parity).

Loads trained weights, generates ``n_maps`` maps for one randomly chosen
parameter set, and compares their log-binned 2-D power spectra against the
matching CAMELS maps (reference: code/sample_power_spectra.py:167-358).

TPU-native: sampling is the jitted lax.scan sampler; all ``n_maps`` spectra
are one batched on-device FFT.
"""

from __future__ import annotations

import os
import random
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import synthetic_camels
from ..data.pipeline import normalize_maps, resize_maps_np
from ..diffusion import make_schedule, sample_ddpm
from ..models import ContextUnet
from ..ops.spectrum import calculate_power_spectrum_2d_batch
from ..training import load_model_weights
from ..utils import viz


def generate_comparison_plot(
    model_path: str,
    camels_data_path: str,
    params_path: str,
    output_dir: str,
    selected_params_dict: Dict[str, float],
    n_maps: int = 15,
    timesteps: int = 1500,
    n_feat: int = 128,
    n_cfeat: int = 6,
    height: int = 64,
    seed: Optional[int] = None,
    serving_steps: Optional[int] = None,
    calibration_path: Optional[str] = None,
    guide_w: float = 0.0,
) -> Dict[str, np.ndarray]:
    """Reference: sample_power_spectra.py:167-358 (same outputs/contract).

    ``serving_steps`` / ``calibration_path`` / ``guide_w`` select the
    certified fast-serving path explicitly (see ``serving.py``); when left
    as None they fall back to the CAMELS_SERVING_STEPS / CAMELS_CALIBRATION
    env opt-ins.  Default is the reference-exact unguided sampler."""
    device_platform = jax.devices()[0].platform
    print(f"Loading trained model... (platform: {device_platform})")
    model = ContextUnet(
        in_channels=1, n_feat=n_feat, n_cfeat=n_cfeat, height=height, levels=2
    )
    template = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, height, height, 1), np.float32),
        np.array([0.5], np.float32),
    )
    if model_path.endswith(".pth"):
        # The reference's headline inference workflow loads its own torch
        # state dicts (sample_power_spectra.py:187-189) — route .pth through
        # the interop importer (torch-free unpickler fallback inside).
        if not os.path.exists(model_path):
            raise FileNotFoundError(model_path)
        from ..utils.torch_interop import load_torch_checkpoint

        variables = load_torch_checkpoint(template, model_path)
    elif os.path.exists(model_path):
        variables = load_model_weights(template, model_path)
    elif os.environ.get("CAMELS_ALLOW_FRESH_WEIGHTS") == "1":
        # Explicit opt-in plumbing-demo mode only: everything downstream runs
        # but the spectra are from random weights.
        print(
            f"  WARNING: checkpoint {model_path} not found — using freshly "
            "initialized weights (CAMELS_ALLOW_FRESH_WEIGHTS=1 demo mode; "
            "spectra will not match)"
        )
        variables = template
    else:
        raise FileNotFoundError(
            f"checkpoint not found: {model_path} (pass a trained .msgpack or "
            "reference .pth; set CAMELS_ALLOW_FRESH_WEIGHTS=1 to run the "
            "plumbing with fresh random weights)"
        )

    # Inference path: fold BatchNorms into the convs (identical math, no BN
    # work in the 1500-step scan).
    from ..models.fold_bn import fold_inference

    model, variables = fold_inference(model, variables)
    schedule = make_schedule(timesteps)  # must match training (:191-197)

    print("Loading CAMELS data...")
    if os.path.exists(camels_data_path) and os.path.exists(params_path):
        camels_data = np.load(camels_data_path)
        param_data = np.load(params_path)
    else:
        print("  (data files absent — using synthetic CAMELS stand-ins)")
        camels_data, param_data = synthetic_camels(
            n_param_sets=8, maps_per_set=15, size=128, seed=seed or 0
        )

    # Same preprocessing recipe as training (:204-214).
    camels_norm = normalize_maps(camels_data, style="code").astype(np.float32)
    camels_resized = resize_maps_np(camels_norm, height)

    # Param norm WITHOUT the x15 expansion (:216-219) — identical min/max.
    pmin = param_data.min(axis=0)
    pmax = param_data.max(axis=0)
    params_normalized = (param_data - pmin) / (pmax - pmin + 1e-8)

    rng = random.Random(seed)
    random_param_idx = rng.randint(0, len(params_normalized) - 1)
    selected = params_normalized[random_param_idx : random_param_idx + 1]
    print(f"Selected parameter set {random_param_idx}:")
    for key, value in selected_params_dict.items():
        print(f"  {key}: {value}")

    start = random_param_idx * 15
    camels_maps = camels_resized[start : start + n_maps]
    print(f"Using CAMELS maps {start} to {start + n_maps - 1}")

    print(f"Generating {n_maps} HI-CDM maps...")
    sel = np.tile(selected.astype(np.float32)[:, :n_cfeat], (n_maps, 1))
    # CAMELS_SERVING_STEPS=<n>: opt-in certified fast path — the strided
    # DDPM sampler (the reference chain's update with composite-alpha jumps,
    # SPEEDUP.md) at n steps instead of the exact timesteps-step loop.
    # Default (unset) is the reference-exact sampler.
    if serving_steps is None:
        serving_steps = int(os.environ.get("CAMELS_SERVING_STEPS", "0"))
    key = jax.random.PRNGKey(seed if seed is not None else 0)
    if serving_steps:
        from ..diffusion.ddim import sample_ddim

        print(f"  (serving fast path: strided DDPM, {serving_steps} steps, "
              f"guide_w={guide_w})")
        out = sample_ddim(
            model, variables, schedule, key, n_sample=n_maps, size=height,
            params=jnp.asarray(sel), guide_w=guide_w, n_steps=serving_steps,
            sigma_mode="beta",
        )
    else:
        out = sample_ddpm(
            model, variables, schedule, key, n_sample=n_maps, size=height,
            params=jnp.asarray(sel), guide_w=guide_w,
        )
    x = out.x
    # CAMELS_CALIBRATION=<calib.npz>: opt-in spectral calibration of the
    # fast path — a fixed radial Fourier filter fitted offline against the
    # exact-chain reference (diffusion/calibration.py, SPEEDUP.md).
    calib_path = (calibration_path
                  if calibration_path is not None
                  else os.environ.get("CAMELS_CALIBRATION"))
    if calib_path:
        from ..diffusion.calibration import (
            SpectralCalibration,
            apply_spectral_calibration,
        )

        print(f"  (spectral calibration: {calib_path})")
        x = apply_spectral_calibration(x, SpectralCalibration.load(calib_path))
    hicdm_maps = np.asarray(x)[..., 0]

    print("Calculating power spectra...")
    k, camels_pk = calculate_power_spectrum_2d_batch(camels_maps)
    _, hicdm_pk = calculate_power_spectrum_2d_batch(hicdm_maps)
    camels_pk = np.asarray(camels_pk)
    hicdm_pk = np.asarray(hicdm_pk)

    camels_pk_mean, camels_pk_std = camels_pk.mean(0), camels_pk.std(0)
    hicdm_pk_mean, hicdm_pk_std = hicdm_pk.mean(0), hicdm_pk.std(0)

    os.makedirs(output_dir, exist_ok=True)
    viz.plot_log_spectrum_comparison(
        k, camels_pk_mean, camels_pk_std, hicdm_pk_mean, hicdm_pk_std,
        selected_params_dict,
        os.path.join(output_dir, "power_spectrum_comparison.png"),
    )
    viz.plot_example_maps_comparison(
        camels_maps, hicdm_maps,
        os.path.join(output_dir, "example_maps_comparison.png"),
    )

    ratio = hicdm_pk_mean / camels_pk_mean
    print("\nPower Spectrum Statistics:")
    print(
        f"Mean P(k) ratio (HI-CDM/CAMELS): "
        f"{np.mean(ratio):.4f} ± {np.std(ratio):.4f}"
    )

    results = {
        "k": k,
        "camels_pk_mean": camels_pk_mean,
        "camels_pk_std": camels_pk_std,
        "hicdm_pk_mean": hicdm_pk_mean,
        "hicdm_pk_std": hicdm_pk_std,
        "parameters": selected_params_dict,
    }
    np.save(os.path.join(output_dir, "power_spectrum_results.npy"), results)
    print(
        "Numerical results saved to: "
        + os.path.join(output_dir, "power_spectrum_results.npy")
    )
    return results
