#!/usr/bin/env python
"""Canonical training CLI (README.md:62-74 contract).

4-arg form: ``python train_diffusion.py <lr> <epochs> <timesteps> <num_params>``
runs the full paper recipe (reference: code/train_diffusion_paper.py).
3-arg form: ``python train_diffusion.py <lr> <epochs> <timesteps>`` runs the
legacy unconditional trainer (reference: code/train_diffusion.py:74-76).

Data paths default to the reference layout (../data/... relative to cwd) and
can be overridden with CAMELS_MAPS_PATH / CAMELS_PARAMS_PATH; synthetic
stand-in data is generated when the files are absent.
"""

import os
import sys

from camels_diffusion_model_tpu.config import config_from_argv
from camels_diffusion_model_tpu.cli import run_experiment


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 3:
        print(__doc__)
        sys.exit(1)
    mode = "paper" if len(argv) >= 4 else "uncond"
    cfg = config_from_argv(
        mode,
        argv,
        maps_path=os.environ.get(
            "CAMELS_MAPS_PATH", "../data/Maps_HI_IllustrisTNG_LH_z=0.00.npy"
        ),
        params_path=os.environ.get("CAMELS_PARAMS_PATH", "../data/params.npy"),
    )
    run_experiment(cfg)


if __name__ == "__main__":
    main()
