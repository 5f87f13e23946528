"""Unit tests: timing_and_performance.log line formats (reference contract)."""

import numpy as np

from camels_diffusion_model_tpu.utils import RunLogger


def test_timing_log_contract(tmp_path):
    lg = RunLogger(str(tmp_path))
    lg.write_header(1e-5, 100, 1500, 6)
    lg.epoch(0, 100, 53.09, 0.150735)
    lg.eval_metrics(0.076976, 0.000132, 0.0, 0.000132, 0.0, 96116.96, 95264.62, 364.0)
    lg.training_complete(12994.66, [53.0, 53.1], 0.053193, 0.076976,
                         0.002437, 0.003714, 87657.895, 87000.0)
    lg.sampling_header()
    lg.reconstruction_perf(10, 19.38, 0.0125, 1500)
    lg.grid_perf(25, 45.77)
    lg.sample_metrics("reconstructed images", 0.1, 0.01, 100.0)
    lg.guidance_metrics(2.0, 0.2, 0.02, 200.0)
    lg.sensitivity_header(0)
    lg.sensitivity_value(0.25, 0.3, 0.03, 300.0)

    log = open(lg.timing_log_path).read()
    # Exact line shapes from the reference's committed logs
    assert "=== Diffusion Model Training and Sampling Timing Log ===" in log
    assert ("Parameters: learning_rate=1e-05, epochs=100, timesteps=1500, "
            "num_params=6") in log
    assert "Epoch 1/100 completed in 53.09 seconds" in log
    assert "  Training Loss: 0.150735" in log
    assert "  Validation Loss: 0.076976" in log
    assert "  Train ELBO: 0.000132, Train BPD: 0.000000" in log
    assert "  Train Negative Log Likelihood: 96116.960000" in log
    assert "  Likelihood calculation took 364.00 seconds" in log
    assert "=== Training Complete ===" in log
    assert "Total training time: 12994.66 seconds (3.61 hours)" in log
    assert "Average time per epoch: 53.05 seconds" in log
    assert "Final training loss: 0.053193" in log
    assert "=== Sampling Performance ===" in log
    assert "Reconstructing 10 test images took 19.38 seconds" in log
    assert "Average time per timestep: 0.0125 seconds" in log
    assert "Total timesteps: 1500" in log
    assert "Generating 25 parameter grid samples took 45.77 seconds" in log
    assert "ELBO of reconstructed images: 0.100000" in log
    assert "Guidance strength 2.0 - ELBO: 0.200000, BPD: 0.020000, NLL: 200.000000" in log
    assert "Parameter 1 sensitivity metrics:" in log
    assert "  Value 0.25 - ELBO: 0.300000, BPD: 0.030000, NLL: 300.000000" in log


def test_dataset_info_contract(tmp_path):
    lg = RunLogger(str(tmp_path))
    lg.dataset_info(
        {
            "total": 15000,
            "train": 13500,
            "test": 1500,
            "num_params": 6,
            "original_param_shape": (1000, 6),
            "expanded_param_shape": (15000, 6),
            "final_param_shape": (15000, 6),
        }
    )
    text = open(tmp_path / "dataset_info.txt").read()
    assert "Total dataset size: 15000" in text
    assert "Train dataset size: 13500" in text
    assert "Number of parameters used for conditioning: 6" in text


def test_selected_params_contract(tmp_path):
    lg = RunLogger(str(tmp_path))
    lg.selected_params(np.array([[0.1234, 0.5678]]))
    text = open(tmp_path / "selected_params.txt").read()
    assert text.startswith("Image 1: ['0.1234', '0.5678']")
