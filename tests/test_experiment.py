"""Integration smoke tests: the unified experiment runner end-to-end on tiny
synthetic data (BASELINE config 1 analogue), per mode family."""

import os

import numpy as np
import pytest

from camels_diffusion_model_tpu.config import MODES, ExperimentConfig, config_from_argv
from camels_diffusion_model_tpu.cli import run_experiment


def _tiny_cfg(mode, tmp_path, **kw):
    base = dict(
        mode=mode,
        lrate=1e-4,
        n_epoch=2,
        timesteps=6,
        num_params=2,
        n_feat=8,
        height=16,
        batch_size=16,
        synthetic_param_sets=3,
        data_size=32,
        output_root=str(tmp_path),
        elbo_subset=16,
        nll_subset=8,
        n_eval_images=5,
    )
    base.update(kw)
    return ExperimentConfig(**base)


def test_config_from_argv_forms():
    cfg = config_from_argv("paper", ["1e-5", "100", "1500", "6"])
    assert cfg.lrate == 1e-5 and cfg.num_params == 6
    assert cfg.output_tag == "paper_lr_1e-05_epochs_100_timesteps_1500_params_6"
    cfg3 = config_from_argv("uncond", ["1e-5", "100", "1500"])
    assert cfg3.output_tag == "BIGnoiselr_1e-05_epochs_100_timesteps_1500"
    cfgi = config_from_argv("spectrum_indiv", ["1e-5", "100", "1500", "3"])
    assert cfgi.param_index == 3 and cfgi.num_params == 1
    assert cfgi.output_tag == "spectrum_lr_1e-05_epochs_100_timesteps_1500_param_3"


def test_all_mode_prefixes_match_reference():
    want = {
        "uncond": "BIGnoiselr_",
        "condition": "conditional_lr_",
        "condition_viridis": "conditional_lr_",
        "likelihood": "likelihood_lr_",
        "elbo": "elbo_bpd_lr_",
        "paper": "paper_lr_",
        "spectrum_final": "elbo_bpd_lr_",
        "spectrum_indiv": "spectrum_lr_",
    }
    for mode, prefix in want.items():
        assert MODES[mode].prefix.startswith(prefix.rstrip("_").split("{")[0])


@pytest.mark.slow
def test_uncond_mode_smoke(tmp_path):
    res = run_experiment(_tiny_cfg("uncond", tmp_path))
    out = res["output_dir"]
    for f in [
        "processed_images.png",
        "loss_evolution.png",
        "reconstructed_images.png",
        "distribution_comparison.png",
        "means.txt",
        "corrected_means.txt",
        "corrected_reconstructed_images.png",
    ]:
        assert os.path.exists(os.path.join(out, f)), f
    assert "mean_ratio" in res


@pytest.mark.slow
def test_paper_mode_smoke(tmp_path):
    res = run_experiment(_tiny_cfg("paper", tmp_path))
    out = res["output_dir"]
    for f in [
        "timing_and_performance.log",
        "dataset_info.txt",
        "selected_params.txt",
        "test_images.png",
        "param_min.npy",
        "param_max.npy",
        "training_metrics.png",
        "reconstructed_images.png",
        "reconstruction_comparison_viridis.png",
        "distribution_comparison.png",
        "parameter_grid_samples_2params.png",
        "guidance_strength_samples.png",
        "guidance_metrics.png",
        "parameter_sensitivity.png",
        "parameter_1_metrics.png",
        os.path.join("weights", "model_epoch_2.msgpack"),
    ]:
        assert os.path.exists(os.path.join(out, f)), f
    log = open(os.path.join(out, "timing_and_performance.log")).read()
    assert "=== Diffusion Model Training and Sampling Timing Log ===" in log
    assert "Epoch 1/2 completed in" in log
    assert "Validation Loss:" in log
    assert "=== Training Complete ===" in log
    assert "=== Sampling Performance ===" in log
    assert "Guidance strength" in log
    assert "sensitivity metrics" in log


@pytest.mark.slow
def test_spectrum_indiv_mode_smoke(tmp_path):
    res = run_experiment(
        _tiny_cfg("spectrum_indiv", tmp_path, num_params=1, param_index=2)
    )
    out = res["output_dir"]
    for f in [
        "param_index.npy",
        "power_spectrum_comparison.png",
        "training_metrics.png",
    ]:
        assert os.path.exists(os.path.join(out, f)), f
    assert int(np.load(os.path.join(out, "param_index.npy"))) == 2
    assert "pk_ratio" in res


@pytest.mark.slow
def test_legacy_variant_modes_smoke(tmp_path):
    """initial.py (deep/LeakyReLU/tanh) and main.py (big/GELU/tanh, STANDARD
    q_sample, fresh-noise sampling) variants run end-to-end."""
    res_i = run_experiment(
        _tiny_cfg("initial", tmp_path / "i", height=16, n_feat=8)
    )
    assert os.path.basename(res_i["output_dir"]).startswith("lr_")
    res_m = run_experiment(_tiny_cfg("main", tmp_path / "m", height=16, n_feat=8))
    assert os.path.exists(os.path.join(res_m["output_dir"], "reconstructed_images.png"))


def test_legacy_mode_defaults():
    cfg = config_from_argv("main", ["1e-5", "10", "100"])
    assert cfg.height == 128 and cfg.n_feat == 256 and cfg.n_cfeat == 10
    assert cfg.spec.q_scaling == "standard"
    cfg2 = config_from_argv("initial", ["1e-5", "10", "100"])
    assert cfg2.height == 128 and cfg2.spec.model_variant == "deep"
    cfg3 = config_from_argv("initial2", ["1e-5", "10", "100"])
    assert cfg3.output_tag.startswith("BIGmassnoiselr_")


@pytest.mark.slow
@pytest.mark.parametrize(
    "mode,check_file",
    [
        ("condition_viridis", "reconstructed_images_viridis.png"),
        ("likelihood", "timing_and_performance.log"),
        ("elbo", "timing_and_performance.log"),
        ("spectrum_final", "training_metrics.png"),
        ("initial2", "corrected_means.txt"),
        ("nov26", "loss_evolution.png"),
    ],
)
def test_remaining_modes_smoke(tmp_path, mode, check_file):
    res = run_experiment(_tiny_cfg(mode, tmp_path))
    assert os.path.exists(os.path.join(res["output_dir"], check_file)), check_file
    if mode == "elbo":
        log = open(
            os.path.join(res["output_dir"], "timing_and_performance.log")
        ).read()
        # per-batch ELBO/BPD logged on the epoch line (train_diffusion_elbo.py:358)
        assert "ELBO:" in log and "BPD:" in log
    if mode == "likelihood":
        log = open(
            os.path.join(res["output_dir"], "timing_and_performance.log")
        ).read()
        assert "Negative Log Likelihood" in log


@pytest.mark.slow
def test_resume_from_checkpoint(tmp_path):
    cfg = _tiny_cfg("condition", tmp_path, n_epoch=2, ckpt_every=1)
    res1 = run_experiment(cfg)
    assert len(res1["epoch_times"]) == 2
    # Resuming the SAME config (same output dir) picks up the saved epoch
    # counter and trains zero additional epochs, but still runs the
    # post-training suite.
    cfg2 = _tiny_cfg("condition", tmp_path, n_epoch=2, ckpt_every=1, resume=True)
    res2 = run_experiment(cfg2)
    assert len(res2["epoch_times"]) == 0
    assert "means" in res2


def test_sample_cli_missing_checkpoint_is_hard_error(tmp_path):
    """A typo'd checkpoint path must NOT silently fall back to fresh random
    weights (it used to produce a complete plausible-looking artifact set)."""
    from camels_diffusion_model_tpu.cli.sample import generate_comparison_plot

    for name in ("absent.msgpack", "absent.pth"):
        with pytest.raises(FileNotFoundError):
            generate_comparison_plot(
                model_path=str(tmp_path / name),
                camels_data_path=str(tmp_path / "no_maps.npy"),
                params_path=str(tmp_path / "no_params.npy"),
                output_dir=str(tmp_path / "out"),
                selected_params_dict={"Omega_m": 0.3},
                n_maps=2,
                timesteps=4,
                n_feat=8,
                height=16,
                seed=1,
            )


@pytest.mark.slow
def test_sample_cli_loads_reference_pth(tmp_path, monkeypatch):
    """The reference's headline inference workflow — sample from a torch
    ``.pth`` state dict (sample_power_spectra.py:187-189) — end-to-end:
    export a trained-format .pth, then run the CLI runner on it."""
    import jax

    from camels_diffusion_model_tpu.cli.sample import generate_comparison_plot
    from camels_diffusion_model_tpu.models import ContextUnet
    from camels_diffusion_model_tpu.utils.torch_interop import (
        save_torch_checkpoint,
    )

    model = ContextUnet(in_channels=1, n_feat=8, n_cfeat=6, height=16, levels=2)
    variables = model.init(
        jax.random.PRNGKey(3),
        np.zeros((1, 16, 16, 1), np.float32),
        np.array([0.5], np.float32),
    )
    pth = str(tmp_path / "model_epoch_100.pth")
    save_torch_checkpoint(variables, pth)
    monkeypatch.setenv("CAMELS_SERVING_STEPS", "4")
    res = generate_comparison_plot(
        model_path=pth,
        camels_data_path=str(tmp_path / "no_maps.npy"),
        params_path=str(tmp_path / "no_params.npy"),
        output_dir=str(tmp_path / "out"),
        selected_params_dict={"Omega_m": 0.3},
        n_maps=5,
        timesteps=8,
        n_feat=8,
        height=16,
        seed=1,
    )
    assert os.path.exists(tmp_path / "out" / "power_spectrum_results.npy")
    assert np.all(np.isfinite(res["hicdm_pk_mean"][np.isfinite(res["k"])][1:]))


@pytest.mark.slow
def test_sample_cli_serving_fast_path(tmp_path, monkeypatch):
    """sample_power_spectra's runner honors CAMELS_SERVING_STEPS (the
    certified strided-DDPM fast path, SPEEDUP.md) and produces the same
    artifact contract as the exact sampler."""
    from camels_diffusion_model_tpu.cli.sample import generate_comparison_plot

    monkeypatch.setenv("CAMELS_SERVING_STEPS", "4")
    monkeypatch.setenv("CAMELS_ALLOW_FRESH_WEIGHTS", "1")
    res = generate_comparison_plot(
        model_path=str(tmp_path / "absent.msgpack"),
        camels_data_path=str(tmp_path / "no_maps.npy"),
        params_path=str(tmp_path / "no_params.npy"),
        output_dir=str(tmp_path / "out"),
        selected_params_dict={"Omega_m": 0.3},
        n_maps=5,  # the example-map figure plots 5 columns (reference layout)
        timesteps=8,
        seed=1,
    )
    assert os.path.exists(tmp_path / "out" / "power_spectrum_results.npy")
    assert np.all(np.isfinite(res["hicdm_pk_mean"][np.isfinite(res["k"])][1:]))
