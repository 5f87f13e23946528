#!/usr/bin/env python
"""Long statistical-quality run: does the trained model reproduce the data's
power spectrum and pixel PDF?

Trains the canonical 6-param model on a full synthetic LH set for enough
epochs that the reconstruction P(k) ratio is meaningful, using the
spectrum_indiv-style validation on top of the paper recipe artifacts.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from camels_diffusion_model_tpu.config import ExperimentConfig
from camels_diffusion_model_tpu.cli import run_experiment


def main():
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/quality100"
    n_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    cfg = ExperimentConfig(
        mode="spectrum_indiv",
        lrate=1e-4,
        n_epoch=n_epoch,
        timesteps=1000,
        num_params=1,
        param_index=1,  # sigma_8 analogue: spectrum amplitude
        batch_size=64,
        synthetic_param_sets=500,
        data_size=256,
        output_root=out_root,
        dtype="bfloat16",
        eval_every=20,
        ckpt_every=50,
        nll_subset=64,
    )
    res = run_experiment(cfg)
    print("loss first/last:", res["loss_log"][0], res["loss_log"][-1])
    print("pk_ratio:", res.get("pk_ratio"))


if __name__ == "__main__":
    main()
