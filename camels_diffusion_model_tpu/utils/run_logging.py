"""Plain-text run logs preserving the reference's observability contract.

The reference's only observability is append-only text files in the run's
output directory (SURVEY §5): ``timing_and_performance.log`` (header +
per-epoch timing + metric blocks, train_diffusion_paper.py:198-202/381-383/
461-467), ``dataset_info.txt`` (:281-288), ``selected_params.txt`` (:311-316),
and a per-epoch device line in ``output.log`` (:72-75).  This module writes
the same files with the same line formats so downstream tooling keeps working;
richer profiling is available separately via ``jax.profiler``.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional

import jax
import numpy as np


def log_device_used(output_file: str = "output.log") -> None:
    """Parity with the reference's ``log_device_used``
    (train_diffusion_paper.py:72-75) — reports the accelerator platform."""
    platform = jax.devices()[0].platform.upper()
    device_used = platform if platform != "CPU" else "CPU"
    with open(output_file, "a") as f:
        f.write(f"Device used: {device_used}\n")


class RunLogger:
    """Writer for the ``outputs/<tag>/`` log-file contract."""

    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.timing_log_path = os.path.join(output_dir, "timing_and_performance.log")

    # -- timing_and_performance.log ---------------------------------------

    def write_header(
        self, lrate: float, n_epoch: int, timesteps: int, num_params: Optional[int]
    ) -> None:
        with open(self.timing_log_path, "w") as f:
            f.write("=== Diffusion Model Training and Sampling Timing Log ===\n\n")
            if num_params is None:
                f.write(
                    f"Parameters: learning_rate={lrate}, epochs={n_epoch}, "
                    f"timesteps={timesteps}\n\n"
                )
            else:
                f.write(
                    f"Parameters: learning_rate={lrate}, epochs={n_epoch}, "
                    f"timesteps={timesteps}, num_params={num_params}\n\n"
                )

    def append(self, text: str) -> None:
        with open(self.timing_log_path, "a") as f:
            f.write(text)

    def epoch(self, ep: int, n_epoch: int, duration: float, loss: float) -> None:
        self.append(
            f"Epoch {ep + 1}/{n_epoch} completed in {duration:.2f} seconds\n"
            f"  Training Loss: {loss:.6f}\n"
        )

    def eval_metrics(
        self,
        val_loss: float,
        train_elbo: float,
        train_bpd: float,
        val_elbo: float,
        val_bpd: float,
        train_nll: float,
        val_nll: float,
        nll_seconds: float,
    ) -> None:
        self.append(
            f"  Validation Loss: {val_loss:.6f}\n"
            f"  Train ELBO: {train_elbo:.6f}, Train BPD: {train_bpd:.6f}\n"
            f"  Val ELBO: {val_elbo:.6f}, Val BPD: {val_bpd:.6f}\n"
            f"  Train Negative Log Likelihood: {train_nll:.6f}\n"
            f"  Val Negative Log Likelihood: {val_nll:.6f}\n"
            f"  Likelihood calculation took {nll_seconds:.2f} seconds\n"
        )

    def training_complete(
        self,
        total_seconds: float,
        epoch_times: Iterable[float],
        final_train_loss: float,
        final_val_loss: Optional[float] = None,
        final_train_bpd: Optional[float] = None,
        final_val_bpd: Optional[float] = None,
        final_train_nll: Optional[float] = None,
        final_val_nll: Optional[float] = None,
    ) -> None:
        self.append(
            "\n=== Training Complete ===\n"
            f"Total training time: {total_seconds:.2f} seconds "
            f"({total_seconds / 3600:.2f} hours)\n"
            f"Average time per epoch: {np.mean(list(epoch_times)):.2f} seconds\n"
            f"Final training loss: {final_train_loss:.6f}\n"
        )
        if final_val_loss is not None:
            self.append(f"Final validation loss: {final_val_loss:.6f}\n")
        if final_train_bpd is not None:
            self.append(f"Final training BPD: {final_train_bpd:.6f}\n")
        if final_val_bpd is not None:
            self.append(f"Final validation BPD: {final_val_bpd:.6f}\n")
        if final_train_nll is not None:
            self.append(
                f"Final training negative log likelihood: {final_train_nll:.6f}\n"
            )
        if final_val_nll is not None:
            self.append(
                f"Final validation negative log likelihood: {final_val_nll:.6f}\n\n"
            )

    def sampling_header(self) -> None:
        self.append("\n=== Sampling Performance ===\n")

    def reconstruction_perf(
        self, n_images: int, seconds: float, per_step: float, timesteps: int
    ) -> None:
        self.append(
            f"Reconstructing {n_images} test images took {seconds:.2f} seconds\n"
            f"Average time per timestep: {per_step:.4f} seconds\n"
            f"Total timesteps: {timesteps}\n"
        )

    def grid_perf(self, n_samples: int, seconds: float) -> None:
        self.append(
            f"Generating {n_samples} parameter grid samples took "
            f"{seconds:.2f} seconds\n"
        )

    def sample_metrics(self, label: str, elbo: float, bpd: float, nll: float) -> None:
        self.append(
            f"ELBO of {label}: {elbo:.6f}\n"
            f"BPD of {label}: {bpd:.6f}\n"
            f"Negative log likelihood of {label}: {nll:.6f}\n"
        )

    def guidance_metrics(self, w: float, elbo: float, bpd: float, nll: float) -> None:
        self.append(
            f"Guidance strength {w} - ELBO: {elbo:.6f}, "
            f"BPD: {bpd:.6f}, NLL: {nll:.6f}\n"
        )

    def sensitivity_header(self, param_idx: int) -> None:
        self.append(f"\nParameter {param_idx + 1} sensitivity metrics:\n")

    def sensitivity_value(self, value: float, elbo: float, bpd: float, nll: float):
        self.append(
            f"  Value {value:.2f} - ELBO: {elbo:.6f}, "
            f"BPD: {bpd:.6f}, NLL: {nll:.6f}\n"
        )

    # -- sidecar files ------------------------------------------------------

    def dataset_info(self, info: Dict[str, object]) -> None:
        path = os.path.join(self.output_dir, "dataset_info.txt")
        with open(path, "w") as f:
            f.write(f"Total dataset size: {info['total']}\n")
            f.write(f"Train dataset size: {info['train']}\n")
            f.write(f"Test dataset size: {info['test']}\n")
            f.write(
                "Number of parameters used for conditioning: "
                f"{info['num_params']}\n"
            )
            f.write(
                f"Original parameter data shape: {info['original_param_shape']}\n"
            )
            f.write(
                f"Expanded parameter data shape: {info['expanded_param_shape']}\n"
            )
            f.write(
                "Final normalized parameter data shape: "
                f"{info['final_param_shape']}\n"
            )

    def selected_params(self, params: np.ndarray) -> None:
        path = os.path.join(self.output_dir, "selected_params.txt")
        text = ""
        for i, row in enumerate(np.asarray(params)):
            text += f"Image {i + 1}: {[f'{p:.4f}' for p in row]}\n"
        with open(path, "w") as f:
            f.write(text)

    def device_line(self) -> None:
        # The reference appends to ./output.log in the process cwd
        # (train_diffusion_paper.py:72-75); writing inside the run's output
        # dir keeps the contract per-run instead of polluting the cwd.
        log_device_used(os.path.join(self.output_dir, "output.log"))
