#!/usr/bin/env python
"""Reference-scale validation run: paper recipe on a full synthetic LH set.

Mirrors the reference's committed-log configuration (1000 parameter sets x 15
maps at 256^2 -> 64^2, 6 conditioning parameters, T=1500, batch 32) at a
reduced epoch count, so the produced timing_and_performance.log is directly
comparable line-by-line with the reference's
(graphs/.../params_6/.../timing_and_performance.log: 53 s/epoch, 364 s
likelihood evals, 19 s 10-map reconstruction, 46 s 25-map grid).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from camels_diffusion_model_tpu.config import ExperimentConfig
from camels_diffusion_model_tpu.cli import run_experiment


def main():
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/capstone"
    n_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    eval_every = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cfg = ExperimentConfig(
        mode="paper",
        lrate=1e-5,
        n_epoch=n_epoch,
        timesteps=1500,
        num_params=6,
        batch_size=32,
        synthetic_param_sets=1000,
        data_size=256,
        output_root=out_root,
        dtype="bfloat16",
        eval_every=eval_every,
    )
    res = run_experiment(cfg)
    print("epoch_times:", [round(t, 1) for t in res["epoch_times"]])
    print("loss_log:", [round(x, 4) for x in res["loss_log"]])


if __name__ == "__main__":
    main()
