#!/usr/bin/env python
"""Legacy variant CLI (reference contract: 26thNovCode.py — 3-arg unconditional).

Usage: python 26thNovCode.py <lr> <epochs> <timesteps>
"""

import os
import sys

from camels_diffusion_model_tpu.config import config_from_argv
from camels_diffusion_model_tpu.cli import run_experiment


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = config_from_argv(
        "nov26",
        argv,
        maps_path=os.environ.get(
            "CAMELS_MAPS_PATH", "../data/Maps_HI_IllustrisTNG_LH_z=0.00.npy"
        ),
        params_path=os.environ.get("CAMELS_PARAMS_PATH", "../data/params.npy"),
    )
    run_experiment(cfg)


if __name__ == "__main__":
    main()
