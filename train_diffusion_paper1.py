#!/usr/bin/env python
"""train_diffusion_paper1: positional CLI wrapper over the unified experiment runner.

Reference contract: code/train_diffusion_paper1.py (argv, output-dir prefix, artifacts).
Usage: python train_diffusion_paper1.py <lr> <epochs> <timesteps> <num_params_or_index>
"""

import os
import sys

from camels_diffusion_model_tpu.config import config_from_argv
from camels_diffusion_model_tpu.cli import run_experiment


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = config_from_argv(
        "paper1",
        argv,
        maps_path=os.environ.get(
            "CAMELS_MAPS_PATH", "../data/Maps_HI_IllustrisTNG_LH_z=0.00.npy"
        ),
        params_path=os.environ.get("CAMELS_PARAMS_PATH", "../data/params.npy"),
    )
    run_experiment(cfg)


if __name__ == "__main__":
    main()
